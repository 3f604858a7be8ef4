package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-granular metrics collector: a [[SparkListener]] that records one
  * row per finished task (stage, run time, shuffle bytes in/out). This is
  * how scale claims get MEASURED instead of argued from plan shape — the
  * scale probe sums shuffle-write bytes per query across two SFs to check
  * linearity, and the skew spec reads per-task run-time histograms to show
  * salting flattening stragglers.
  *
  * The listener bus delivers events asynchronously, so a reader right
  * after an action can miss the tail of its own job; [[awaitQuiescent]]
  * polls until the record count stops moving — crude but dependency-free
  * (the synchronous flush lives behind `private[spark]`).
  */
final class TaskProbe extends SparkListener {
  import TaskProbe.TaskRec

  private val recs = new ConcurrentLinkedQueue[TaskRec]()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) recs.add(TaskRec(
      stageId = e.stageId,
      runTimeMs = m.executorRunTime,
      shuffleWriteBytes = m.shuffleWriteMetrics.bytesWritten,
      shuffleReadBytes = m.shuffleReadMetrics.totalBytesRead))
  }

  def snapshot(): Vector[TaskRec] = {
    import scala.jdk.CollectionConverters._
    recs.iterator().asScala.toVector
  }

  def reset(): Unit = recs.clear()

  /** Block until no new task-end events have arrived for two consecutive
    * polls (or `maxWaitMs` passes). Call after the action completes and
    * before reading [[snapshot]].
    */
  def awaitQuiescent(maxWaitMs: Long = 5000L): Unit = {
    var last = -1
    var stable = 0
    val t0 = System.currentTimeMillis()
    while (stable < 2 && System.currentTimeMillis() - t0 < maxWaitMs) {
      Thread.sleep(150)
      val n = recs.size()
      if (n == last) stable += 1 else { stable = 0; last = n }
    }
  }
}

object TaskProbe {
  final case class TaskRec(stageId: Int, runTimeMs: Long,
                           shuffleWriteBytes: Long, shuffleReadBytes: Long)
}
