package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Entry point for the reference-dialect SQL front end (T4 + Q1–Q20).
  * Rewrites run on text; probe queries used for `* EXCEPT/REPLACE/RENAME`
  * expansion are analysis-only (spark.sql(...).schema) — no jobs run.
  */
object GraftSql {

  def rewrite(spark: SparkSession, sql: String): String = {
    val pass1 = SqlRewriter.rewriteQuotesAndFunctions(sql)
    SqlRewriter.expandStarModifiers(pass1, probe => spark.sql(probe).columns.toSeq)
  }

  def run(spark: SparkSession, sql: String): DataFrame = {
    val rewritten = rewrite(spark, sql)
    try spark.sql(rewritten)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("UNRESOLVED_COLUMN") || e.getMessage.contains("cannot be resolved") =>
        // Q15: HAVING referencing a select-list alias
        spark.sql(SqlRewriter.rewriteHavingAliases(rewritten))
    }
  }
}
