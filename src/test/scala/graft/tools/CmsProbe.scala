import org.apache.spark.sql.functions._
import graft.operators.Cms
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val words = docs.select(explode(filter(split(lower(trim(col("text"))), "\\s+"), w => length(w) > 0)).as("term"))
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"[probe] $label: ${(System.nanoTime()-t0)/1e9}")
    }
    t("words count")(words.count())
    t("sketch")(Cms.cmsSketch(words, "term", 4, 64).count())
    val sketch = Cms.cmsSketch(words, "term", 4, 64)
    val truth = words.groupBy("term").agg(count(lit(1)).as("true_cnt"))
    val top = truth.orderBy(col("true_cnt").desc, col("term")).limit(20)
    t("top")(top.count())
    t("estimate")(Cms.cmsEstimate(sketch, top.select("term"), "term", 4, 64).count())
    spark.stop()
  }
}
