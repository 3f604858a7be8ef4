package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class LabelPropSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // two triangles bridged by one edge — the classic two-community fixture;
  // symmetrized explicitly (communities expects an undirected edge list)
  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("two bridged triangles converge onto their lowest member labels") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)))
    // synchronous LPA needs 3 rounds here: the bridge keeps the right
    // triangle split after 2 (4 votes with {1,4,4}, 5/6 tie to 3)
    val got = LabelProp.communities(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(got(1L), got(2L), got(3L)).size == 1, s"left triangle split: $got")
    assert(Set(got(4L), got(5L), got(6L)).size == 1, s"right triangle split: $got")
    assert(got(1L) != got(5L), s"communities merged: $got")
  }

  test("deterministic across runs and iters=0 is the identity labeling") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (7L, 8L)))
    val a = LabelProp.communities(edges, iters = 2)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = LabelProp.communities(edges, iters = 2)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
    val id0 = LabelProp.communities(edges, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(id0.forall { case (n, l) => n == l })
  }

  test("tie on counts goes to the lowest label") {
    // node 2 has neighbors 1 and 3, one vote each after round 1 —
    // the argmax must pick the LOWER label deterministically
    val edges = sym(Seq((1L, 2L), (2L, 3L)))
    val got = LabelProp.communities(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 1L, s"tie not broken to lowest: $got")
  }
}
