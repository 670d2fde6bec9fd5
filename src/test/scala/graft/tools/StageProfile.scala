package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Per-stage profile of one SparkEntry gate (dev tool): runs the named
  * query against a testdata dir and prints every completed stage's
  * wall time, task time, input/shuffle volumes and memory/disk spill —
  * the numbers that say WHICH exchange or scan dominates a gate at a
  * given scale.
  *
  *   Test/runMain graft.tools.StageProfile text_strip_repeated /tmp/sf100 [shufflePartitions]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val parts = if (args.length > 2) args(2).toInt else 128
    val spark = graft.GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      shufflePartitions = parts)
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
        gcMs: Long, inputMB: Long, shReadMB: Long, shWriteMB: Long,
        memSpillMB: Long, diskSpillMB: Long, tasks: Int)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(80), wall,
            m.executorRunTime, m.jvmGCTime, m.inputMetrics.bytesRead >> 20,
            m.shuffleReadMetrics.totalBytesRead >> 20,
            m.shuffleWriteMetrics.bytesWritten >> 20,
            m.memoryBytesSpilled >> 20, m.diskBytesSpilled >> 20,
            i.numTasks)
        }
      }
    })

    val q = graft.SparkEntry.queries(gate)
    val t0 = System.nanoTime()
    q(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events drain asynchronously (the bus API is
    // private[spark]; a short settle covers the tail of a finished job)
    Thread.sleep(3000)

    println(f"[stageprofile] $gate @ $dir total ${wall}%.1f s, ${stages.size} stages")
    println(f"${"stage"}%6s ${"wall_s"}%8s ${"task_s"}%8s ${"gc_s"}%7s ${"in_MB"}%8s " +
      f"${"shR_MB"}%8s ${"shW_MB"}%8s ${"spillM"}%7s ${"spillD"}%7s ${"tasks"}%6s  name")
    stages.sortBy(-_.wallMs).foreach { s =>
      println(f"${s.id}%6d ${s.wallMs / 1e3}%8.1f ${s.taskMs / 1e3}%8.1f " +
        f"${s.gcMs / 1e3}%7.1f ${s.inputMB}%8d ${s.shReadMB}%8d ${s.shWriteMB}%8d " +
        f"${s.memSpillMB}%7d ${s.diskSpillMB}%7d ${s.tasks}%6d  ${s.name}")
    }
    spark.stop()
  }
}
