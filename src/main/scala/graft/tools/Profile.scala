package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._
import graft.SparkEntry

/** Dev tool (optimization rounds): run selected gate queries under a
  * SparkListener and print a per-JOB breakdown — wall seconds, task
  * count, summed executor task time, shuffle read/write bytes, spill —
  * plus the gate's total wall and job count. The empirical half of
  * guide §1.1: at sf0.1 a gate's seconds are often fixed per-job
  * overhead (scheduling, codegen, tiny-file IO), and this table is how
  * that is distinguished from real compute before any change is made.
  *
  *   scripts/run_main.sh graft.tools.Profile ann_ivf_index_append ...
  *
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) and SPARK_GRAFT_CPUS like
  * Bench; never part of any artifact — measurement only.
  */
object Profile {

  final case class JobRow(id: Int, desc: String, wallMs: Long,
      tasks: Int, taskTimeMs: Long, shufReadB: Long, shufWriteB: Long,
      spillB: Long, inputB: Long)

  final class Collector extends SparkListener {
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[JobRow]()
    // per-stage metrics keyed by stage id, attributed to the job that
    // submitted the stage
    val stageToJob = mutable.Map[Int, Int]()
    val jobAgg = mutable.Map[Int, (Int, Long, Long, Long, Long, Long)]()

    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      starts(js.jobId) = (js.time, desc)
      js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
    }

    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
      val si = sc.stageInfo
      val jid = stageToJob.getOrElse(si.stageId, -1)
      val m = si.taskMetrics
      val prev = jobAgg.getOrElse(jid, (0, 0L, 0L, 0L, 0L, 0L))
      jobAgg(jid) = (
        prev._1 + si.numTasks,
        prev._2 + m.executorRunTime,
        prev._3 + m.shuffleReadMetrics.totalBytesRead,
        prev._4 + m.shuffleWriteMetrics.bytesWritten,
        prev._5 + m.diskBytesSpilled,
        prev._6 + m.inputMetrics.bytesRead)
    }

    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      starts.remove(je.jobId).foreach { case (t0, desc) =>
        val (tasks, tt, sr, sw, sp, in) =
          jobAgg.getOrElse(je.jobId, (0, 0L, 0L, 0L, 0L, 0L))
        rows += JobRow(je.jobId, desc, je.time - t0, tasks, tt, sr, sw, sp, in)
      }
    }

    def drain(): Seq[JobRow] = synchronized { val r = rows.toVector; rows.clear(); r }
  }

  private def fmtB(b: Long): String =
    if (b >= 10L * 1024 * 1024) f"${b / 1024.0 / 1024.0}%.0fM"
    else if (b >= 10 * 1024) f"${b / 1024.0}%.0fK"
    else b.toString

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    val spark = graft.GraftSession.local(cpus, 32)
    spark.sparkContext.setLogLevel("WARN")
    val coll = new Collector
    spark.sparkContext.addSparkListener(coll)

    // warmup (codegen, parquet footer caches) so gate 1 isn't charged for it
    SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(300); coll.drain()

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(400) // let listener events drain
      val rows = coll.drain()
      println(f"\n===== $n: total ${(t2 - t0) / 1e9}%.2f s " +
        f"(build ${(t1 - t0) / 1e9}%.2f, exec ${(t2 - t1) / 1e9}%.2f), " +
        s"${rows.length} jobs =====")
      println(f"${"job"}%4s ${"wall_s"}%7s ${"tasks"}%5s ${"task_s"}%7s " +
        f"${"shRead"}%7s ${"shWrite"}%8s ${"spill"}%6s ${"input"}%7s  desc")
      rows.sortBy(_.id).foreach { r =>
        println(f"${r.id}%4d ${r.wallMs / 1000.0}%7.2f ${r.tasks}%5d " +
          f"${r.taskTimeMs / 1000.0}%7.2f ${fmtB(r.shufReadB)}%7s " +
          f"${fmtB(r.shufWriteB)}%8s ${fmtB(r.spillB)}%6s ${fmtB(r.inputB)}%7s  " +
          r.desc.take(70))
      }
      val gaps = rows.map(_.wallMs).sum / 1000.0
      println(f"  sum(job wall) ${gaps}%.2f s vs gate wall — the gap is " +
        "driver-side work (planning, collects between jobs, file ops)")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
