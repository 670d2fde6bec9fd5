package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the curation expression costs at sf0.1 (kept: it
  * caught the per-element lambda re-evaluation trap in kgrams — the
  * transform+slice formulation measured ~40x slower steady-state). */
object RepBisect {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id","text")
    def t(label: String)(dfb: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        dfb.write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println(f"BISECT $label: ${times.map(x => f"$x%.2f").mkString(" ")}")
    }
    t("warm")(d)
    t("full-repetition")(graft.operators.Curation.withRepetition(d, "text").drop("text"))
    t("decontaminate")(graft.operators.Curation.contaminationReport(
      d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
      d.filter(col("doc_id") % 97 === 0), "text", 5))
    spark.stop()
  }
}
