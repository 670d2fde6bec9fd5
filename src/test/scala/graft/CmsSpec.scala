package graft

import graft.operators.Cms
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int): Seq[String] =
    (0 until n).map(i => s"t${i % (1 + i % 17)}") // skewed multiplicities

  test("never underestimates; exact at collision-free width; reference-exact") {
    val keys = corpus(400)
    val df = keys.toDF("term")
    val truth = keys.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val probes = truth.keys.toSeq.toDF("term")
    // tight width (collisions certain) → est >= true, never under
    val tight = Cms.cmsSketch(df, "term", depth = 3, width = 16)
    val estT = Cms.cmsEstimate(tight, probes, "term", depth = 3, width = 16)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (k, t) =>
      assert(estT(k) >= t, s"underestimate at $k: ${estT(k)} < $t")
    }
    // generous width (17 distinct keys, 4096 cells) → every estimate
    // exact unless the md5 fold collides, which we verify it doesn't
    val wide = Cms.cmsSketch(df, "term", depth = 4, width = 4096)
    val estW = Cms.cmsEstimate(wide, probes, "term", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(estW == truth, s"wide sketch should be exact: $estW vs $truth")
    // reference-exact cells: replay one key's row hashes in plain Scala
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def refCell(k: String, r: Int, w: Int): Long =
      md5hex(k + "#cms").slice(6 * r, 6 * r + 6)
        .foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16)) % w
    val cells = tight.as[(Int, Long, Long)].collect()
      .map { case (r, b, c) => (r, b) -> c }.toMap
    truth.foreach { case (k, _) =>
      (0 until 3).foreach { r =>
        assert(cells.contains((r, refCell(k, r, 16))),
          s"cell for ($k, row $r) missing at the reference bucket")
      }
    }
  }

  test("mergeable: sketch(A) + sketch(B) cell-summed == sketch(A ∪ B)") {
    val a = corpus(150)
    val b = corpus(90).map(_ + "x") ++ corpus(60)
    val sa = Cms.cmsSketch(a.toDF("term"), "term", depth = 4, width = 64)
    val sb = Cms.cmsSketch(b.toDF("term"), "term", depth = 4, width = 64)
    val summed = sa.unionByName(sb)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Cms.cmsSketch((a ++ b).toDF("term"), "term", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(summed == whole)
  }

  test("null keys skipped; absent probe estimates 0 only when its cells are empty") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("term")
    val sk = Cms.cmsSketch(df, "term", depth = 2, width = 1024)
    val est = Cms.cmsEstimate(sk,
        Seq("a", "b", "neverseen").toDF("term"), "term", depth = 2, width = 1024)
      .as[(String, Long)].collect().toMap
    assert(est("a") == 2L && est("b") == 1L)
    assert(est("neverseen") <= 2L) // may collide, never negative/underestimated
    // shape validation
    intercept[IllegalArgumentException] {
      Cms.cmsSketch(df, "term", depth = 0)
    }
    intercept[IllegalArgumentException] {
      Cms.cmsSketch(df, "term", depth = 6) // only 32 hex digits to slice
    }
    intercept[IllegalArgumentException] {
      Cms.cmsSketch(df, "term", width = 100)
    }
  }

  test("sketch cardinality is bounded by depth×width regardless of key cardinality") {
    val many = (0 until 5000).map(i => s"unique$i").toDF("term")
    val sk = Cms.cmsSketch(many, "term", depth = 4, width = 64)
    assert(sk.count() <= 4L * 64L)
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"two-phase count expected:\n$plan")
  }
}
