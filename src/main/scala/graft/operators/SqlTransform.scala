package graft.operators

import graft.sql.GraftSql
import org.apache.spark.sql.DataFrame

/** T4 — SQL query execution against the current frame, registered as a
  * temp view under a configurable name (reference transforms.rs:81-94;
  * default table name `AllData`, args.rs:164-174).
  *
  * Spark-first: `createOrReplaceTempView` + `spark.sql` keeps the whole
  * pipeline one Catalyst plan — the view is a plan alias, not a
  * materialization, so pushdown/pruning cross the SQL boundary freely.
  */
final case class SqlTransform(query: String, tableName: String = "AllData")
    extends Transform {
  def apply(df: DataFrame): DataFrame = {
    df.createOrReplaceTempView(tableName)
    GraftSql.run(df.sparkSession, query)
  }
}
