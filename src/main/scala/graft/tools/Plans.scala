package graft.tools

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for selected queries so the
  * pushdown/broadcast/codegen properties can be inspected and asserted. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q2_filter", "q16_join_agg", "q1_agg")
    val spark = graft.GraftSession.local(8, 32)
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
