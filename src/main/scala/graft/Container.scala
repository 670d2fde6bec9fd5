package graft

import graft.meta.Introspect
import graft.operators.{Pipeline, PipelineConfig, SortOps}
import graft.sources.{ReadConfig, Readers}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The reference's interactive state container re-expressed for a
  * distributed engine (reference DataContainer, data_container.rs:44-66 +
  * query lifecycle SURVEY §3).
  *
  * Two-tier caching semantics (data_filter.rs:65 `read_data_from_file`):
  *   - `original` — the frame as loaded, CACHED (the reference's
  *     `df_original: Arc<DataFrame>`); filter/SQL changes re-run the
  *     pipeline from here WITHOUT re-reading the file;
  *   - `current` — the displayed frame after pipeline + cumulative sort.
  *
  * "Cache" means `persist(MEMORY_AND_DISK)` of the distributed frame —
  * never a driver collect; at 100 TB the current frame stays partitioned
  * and interactive latency comes from Spark's cached-block reads.
  */
final class Container private (
    val spark: SparkSession,
    val path: Option[String],
    val original: DataFrame,
    val cfg: PipelineConfig,
    val sortCriteria: Seq[SortOps.SortBy],
    val detectedDelimiter: Option[Char]) {

  /** The displayed frame: pipeline over the cached original, then the
    * cumulative sort (empty criteria → pipeline output as-is, mirroring
    * the reference's reset-by-rerun, data_container.rs:251-267). */
  lazy val current: DataFrame = {
    val piped = Pipeline.run(original, cfg)
    if (sortCriteria.isEmpty) piped else SortOps.stableSort(piped, sortCriteria)
  }

  /** Re-query from memory: new pipeline config, same cached original
    * (reference: filter change with read_data_from_file=false). */
  def withConfig(newCfg: PipelineConfig): Container =
    new Container(spark, path, original, newCfg, Seq.empty, detectedDelimiter)

  /** Header-click sort: fold the click into the cumulative criteria
    * (reference data_container.rs:351-449). */
  def clickColumn(column: String): Container =
    new Container(spark, path, original, cfg,
      SortOps.applyClick(sortCriteria, column), detectedDelimiter)

  /** Explicit sort criteria (empty = reset). */
  def withSort(criteria: Seq[SortOps.SortBy]): Container =
    new Container(spark, path, original, cfg, criteria, detectedDelimiter)

  /** Re-read from file (reference: delimiter/infer-rows change sets
    * read_data_from_file=true). The old cache is released only AFTER the
    * new load succeeds — a failed reload (bad path/delimiter) must not
    * strip the still-live container of its cache. */
  def reload(readCfg: ReadConfig): Container = {
    val p = path.getOrElse(
      throw new IllegalStateException("container not backed by a file"))
    val next = Container.load(spark, p, readCfg, cfg)
    original.unpersist()
    next
  }

  /** M1 shape of the displayed frame. */
  def shape: (Long, Int) = Introspect.shape(current)

  /** M3 example queries regenerated for the CURRENT schema (reference
    * refreshes them after every run, data_filter.rs:962-963). */
  def exampleQueries: Seq[String] =
    Introspect.sqlExamples(current.schema, cfg.tableName)

  def release(): Unit = original.unpersist()
}

object Container {

  /** CLI-startup load (SURVEY §3.1): read via format dispatch (with CSV
    * delimiter sniffing), cache the original, run the pipeline. */
  def load(spark: SparkSession, path: String,
      readCfg: ReadConfig = ReadConfig(),
      cfg: PipelineConfig = PipelineConfig()): Container = {
    val (df, delim) = Readers.readAuto(spark, path, readCfg)
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    new Container(spark, Some(path), cached, cfg, Seq.empty, delim)
  }

  /** Wrap an existing frame (e.g. a testdata parquet table). */
  def fromDataFrame(spark: SparkSession, df: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): Container =
    new Container(spark, None, df.persist(StorageLevel.MEMORY_AND_DISK),
      cfg, Seq.empty, None)
}
