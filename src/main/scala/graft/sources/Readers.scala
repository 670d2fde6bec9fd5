package graft.sources

import graft.GraftError
import graft.operators.RegexPattern
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read-side configuration mirroring the reference's DataFilter
  * (data_filter.rs:154-198): delimiter, header, bounded schema-inference
  * window, force-string column overrides, permissive parsing. */
final case class ReadConfig(
    delimiter: Option[Char] = None,
    header: Boolean = true,
    /** Rows scanned for schema inference; 0 → everything stays String
      * (reference DEFAULT_INFER_SCHEMA_ROWS = 200, data_filter.rs:42). */
    inferSchemaRows: Int = 200,
    /** Regex (`*` or `^…$`) of columns forced to StringType at read time —
      * protects huge numeric IDs from lossy inference
      * (reference --force-string-cols, args.rs:76-96). */
    forceStringRegex: Option[String] = None,
    /** CSV charset (Spark's `encoding` option), e.g. "ISO-8859-1".
      *
      * DOCUMENTED DIVERGENCE from the reference: polars-view reads CSV
      * with LossyUtf8 (data_filter.rs:578-585) — a malformed byte decodes
      * to U+FFFD and the rest of the row survives. Spark has no lossy
      * mode: under the default UTF-8, a row with malformed bytes is
      * PERMISSIVE-nulled wholesale (or the bytes pass through verbatim on
      * the non-multiline path — version-dependent), so set this to the
      * file's real charset (e.g. Latin-1, which decodes every byte
      * sequence) to recover the reference's never-fail behavior.
      * Proof fixture: SourcesSpec "malformed UTF-8 mid-file" — a bad
      * byte mid-corpus keeps all 50 rows and every clean column intact
      * under the Latin-1 fallback; only the damaged cell's substitution
      * differs from the reference's U+FFFD. */
    encoding: Option[String] = None)

/** S1–S7: format dispatch + readers. All readers return a lazy DataFrame
  * — no collect; the scan parallelizes over file splits as usual.
  *
  * Inference-window emulation: Spark's CSV inference scans the whole
  * file; the reference bounds it to N rows. We reproduce the bound by
  * inferring on a head sample (one small job) and applying the resulting
  * schema to the full scan — same cost profile as the reference.
  */
object Readers {

  sealed trait Format
  object Format {
    case object Csv extends Format
    case object Json extends Format
    case object NdJson extends Format
    case object Parquet extends Format
    case object Orc extends Format

    /** Extension → format (reference file_extension.rs:6-36, lowercased;
      * ORC is an extension beyond the reference — a columnar format
      * Spark supports natively, so a Spark-first engine exposes it). */
    def fromPath(path: String): Format = {
      val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
      ext match {
        case "csv"             => Csv
        case "json"            => Json
        case "ndjson" | "jsonl" => NdJson
        case "parquet" | "pq"  => Parquet
        case "orc"             => Orc
        case other             => throw GraftError.UnsupportedFileExtension(other)
      }
    }
  }

  /** S7 dispatch. Returns (frame, detected delimiter for CSV).
    *
    * CSV head sampling is SHARED: one small head job feeds both the
    * delimiter probe and the bounded schema inference (previously each
    * fetched its own head — two jobs and two file-head reads per open). */
  def readAuto(spark: SparkSession, path: String,
      cfg: ReadConfig = ReadConfig()): (DataFrame, Option[Char]) =
    Format.fromPath(path) match {
      case Format.Csv =>
        val headN = math.max(CsvSniffer.ProbeRows,
          math.max(cfg.inferSchemaRows, 1) + (if (cfg.header) 1 else 0))
        val head = CsvSniffer.headLines(spark, path, headN, cfg.encoding)
        if (head.isEmpty) throw GraftError.DelimiterNotDetected(path)
        val candidates = CsvSniffer.uniqueCandidates(cfg.delimiter)
        // last-candidate bypass as in CsvSniffer.detect (reference
        // data_filter.rs:509): an undetectable file degrades to 1 column;
        // an explicitly configured delimiter wins the fallback
        val d = candidates
          .find(CsvSniffer.probe(head.take(CsvSniffer.ProbeRows), _, cfg.header))
          .getOrElse(cfg.delimiter.getOrElse(candidates.last))
        val schema = inferCsvSchemaFromSample(spark, head, d.toString, cfg)
        (csvReader(spark, d.toString, cfg).schema(schema).csv(path), Some(d))
      case Format.Json    => (readJson(spark, path, cfg), None)
      case Format.NdJson  => (readNdJson(spark, path, cfg), None)
      case Format.Parquet => (readParquet(spark, path), None)
      case Format.Orc     => (readOrc(spark, path), None)
    }

  private def csvReader(spark: SparkSession, sep: String, cfg: ReadConfig) = {
    val r = spark.read
      .option("sep", sep)
      .option("header", cfg.header)
      .option("mode", "PERMISSIVE")        // ignore_errors → null
      .option("nullValue", "")             // missing_is_null
      .option("enforceSchema", true)
    cfg.encoding.fold(r)(r.option("encoding", _))
  }

  /** S2: CSV with bounded inference + force-string overrides. */
  def readCsv(spark: SparkSession, path: String, cfg: ReadConfig): DataFrame = {
    val sep = cfg.delimiter
      .getOrElse(CsvSniffer.detect(spark, path, None, cfg.header, cfg.encoding)).toString
    val schema = inferCsvSchema(spark, path, sep, cfg)
    csvReader(spark, sep, cfg).schema(schema).csv(path)
  }

  /** Bounded-window CSV schema inference on a head sample (fetched with
    * cfg.encoding, so inferred column NAMES aren't mangled for
    * non-UTF-8 files), then force-string overrides applied. */
  def inferCsvSchema(spark: SparkSession, path: String, sep: String,
      cfg: ReadConfig): StructType = {
    val n = math.max(cfg.inferSchemaRows, 1) + (if (cfg.header) 1 else 0)
    val sample = CsvSniffer.headLines(spark, path, n, cfg.encoding)
    inferCsvSchemaFromSample(spark, sample, sep, cfg)
  }

  /** Schema inference over an already-fetched head sample (no extra job
    * beyond the local-sample parse). */
  def inferCsvSchemaFromSample(spark: SparkSession, sample: Seq[String],
      sep: String, cfg: ReadConfig): StructType = {
    import spark.implicits._
    val n = math.max(cfg.inferSchemaRows, 0) + (if (cfg.header) 1 else 0)
    val inferred: StructType =
      if (cfg.inferSchemaRows == 0) {
        // 0 → no inference: header names, all String
        val ds: Dataset[String] = spark.createDataset(sample.take(math.max(n, 1)))
        val head = spark.read.option("sep", sep).option("header", cfg.header)
          .option("inferSchema", false).csv(ds)
        StructType(head.schema.fields.map(f => f.copy(dataType = StringType)))
      } else {
        val ds: Dataset[String] = spark.createDataset(sample.take(n))
        spark.read.option("sep", sep).option("header", cfg.header)
          .option("inferSchema", true)
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
          .option("preferDate", true)      // try_parse_dates
          .csv(ds).schema
      }
    applyForceString(inferred, cfg.forceStringRegex)
  }

  /** Force regex-matched columns to StringType (reference
    * data_filter.rs:1133-1191). */
  def applyForceString(schema: StructType, pattern: Option[String]): StructType =
    pattern match {
      case None => schema
      case Some(p) =>
        val matched = RegexPattern.resolve(p, schema.fields.map(_.name).toSeq).toSet
        StructType(schema.fields.map { f =>
          if (matched.contains(f.name)) f.copy(dataType = StringType) else f
        })
    }

  /** S4: single-document / array JSON, with the same bounded inference +
    * force-string semantics as CSV (reference applies infer_schema_len to
    * both JSON readers, data_filter.rs:312,340 — the huge-numeric-ID
    * lossy-inference hazard is identical). The head sample is produced by
    * STREAM-parsing only the first `inferSchemaRows` array elements off
    * the file head (Jackson incremental parser — never a full-document
    * pass just to infer). */
  def readJson(spark: SparkSession, path: String, cfg: ReadConfig): DataFrame = {
    val schema = inferJsonSchema(spark,
      headJsonArrayElements(spark, path, math.max(cfg.inferSchemaRows, 1)), cfg)
    val base = spark.read.option("multiLine", true).option("mode", "PERMISSIVE")
    schema.fold(base.json(path))(s => base.schema(s).json(path))
  }

  /** S5: newline-delimited JSON with bounded inference + force-string
    * (one-small-job head sample, like the CSV path). */
  def readNdJson(spark: SparkSession, path: String, cfg: ReadConfig): DataFrame = {
    import scala.jdk.CollectionConverters._
    val head = spark.read.textFile(path)
      .limit(math.max(cfg.inferSchemaRows, 1)).collectAsList().asScala.toSeq
    val schema = inferJsonSchema(spark, head, cfg)
    val base = spark.read.option("mode", "PERMISSIVE")
    schema.fold(base.json(path))(s => base.schema(s).json(path))
  }

  /** Schema from a head sample of JSON documents: inferred by Spark's
    * JSON reader over the sample, then force-string overrides; with
    * inferSchemaRows == 0 every top-level field becomes String (Spark's
    * JSON parser renders any non-string token — numbers, objects — as its
    * raw text when the schema says String, so nothing is lost). None →
    * sample empty, let the full read infer. */
  def inferJsonSchema(spark: SparkSession, sample: Seq[String],
      cfg: ReadConfig): Option[StructType] = {
    if (sample.isEmpty) return None
    import spark.implicits._
    val inferred = spark.read.json(spark.createDataset(sample)).schema
    val bounded =
      if (cfg.inferSchemaRows == 0)
        StructType(inferred.fields.map(_.copy(dataType = StringType)))
      else inferred
    Some(applyForceString(bounded, cfg.forceStringRegex))
  }

  /** First `n` elements of a JSON array document as individual JSON
    * strings, reading only the file head (Jackson streaming). Directory
    * inputs use their first contained file. */
  def headJsonArrayElements(spark: SparkSession, path: String, n: Int): Seq[String] = {
    import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(hPath).isDirectory)
        fs.listStatus(hPath).filter(_.isFile).map(_.getPath)
          .sortBy(_.getName).headOption.getOrElse(hPath)
      else hPath
    val in = fs.open(file)
    try {
      val factory = new JsonFactory()
      val parser = factory.createParser(in: java.io.InputStream)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var t = parser.nextToken()
      if (t == JsonToken.START_ARRAY) t = parser.nextToken()
      while (out.length < n && t != null && t != JsonToken.END_ARRAY) {
        val w = new java.io.StringWriter()
        val g = factory.createGenerator(w)
        g.copyCurrentStructure(parser)
        g.close()
        out += w.toString
        t = parser.nextToken()
      }
      out.toSeq
    } finally in.close()
  }

  /** S6: Parquet; tolerates TIMESTAMP(NANOS) columns by reading nanos as
    * long (caller converts if timestamp semantics are needed). */
  def readParquet(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  /** ORC (native Spark datasource — vectorized scan, predicate pushdown
    * and column pruning like parquet). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
