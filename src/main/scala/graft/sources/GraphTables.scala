package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize-once graph tables derived from the warehouse facts.
  *
  * Five graph queries (PageRank, label propagation, BFS, Bellman-Ford,
  * random walks) analyze the SAME symmetrized customer↔supplier purchase
  * graph; inline, each re-derived it with its own fact join + distinct —
  * at 100 TB that is five redundant passes over the largest table for one
  * immutable edge list. Production graph stacks materialize the edge
  * table once per corpus snapshot and point every algorithm at it; this
  * does the same with the repo's stamped-artifact convention
  * (`_SUCCESS`-idempotent, path keyed by the testdata stamp —
  * Dedup.ensureBandIndex / Similarity.ensureCentroidIndex precedent).
  * The stored table is the WEIGHTED graph (src, dst, cnt): the unweighted
  * edge list is its projection, so one groupBy-count build (the same
  * shuffle a bare distinct would cost) serves both the unweighted
  * algorithms and the interaction-cost ones. Edges and counts are exact
  * BIGINTs, so the parquet roundtrip loses nothing and every oracle still
  * re-derives the graph from the facts independently.
  */
object GraphTables {

  /** Symmetrized weighted purchase graph (src, dst, cnt): per-pair
    * lineitem⋈orders interaction counts, customers offset by 1e6 into a
    * disjoint id space, both orientations (cnt is per-pair, so it is the
    * same in each direction). Built on first call per testdata stamp,
    * read from parquet after.
    */
  def weightedPurchaseGraph(s: SparkSession, dir: String): DataFrame = {
    val stamp = new java.io.File(s"$dir/lineitem.parquet").lastModified()
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/tmp/graft_purchase_graph_${tag}_$stamp"
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      // merge-pinned: orders is fact-sized, never broadcastable at scale
      // (and one plan shape at every SF keeps the scale probe honest)
      val e0 = li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy((col("o_custkey") + lit(1000000L)).as("c"),
          col("l_suppkey").as("sup"))
        .agg(count(lit(1)).as("cnt"))
      e0.select(col("c").as("src"), col("sup").as("dst"), col("cnt"))
        .union(e0.select(col("sup").as("src"), col("c").as("dst"), col("cnt")))
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  /** The unweighted symmetrized purchase graph (src, dst): a projection
    * of [[weightedPurchaseGraph]] — column pruning reaches the parquet
    * scan, so the cnt column is never read.
    */
  def purchaseGraph(s: SparkSession, dir: String): DataFrame =
    weightedPurchaseGraph(s, dir).select("src", "dst")
}
