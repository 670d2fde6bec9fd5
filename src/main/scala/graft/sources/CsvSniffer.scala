package graft.sources

import graft.GraftError
import org.apache.spark.sql.SparkSession

/** CSV delimiter auto-detection (reference S1: data_filter.rs:392-466 —
  * tries the configured delimiter then `, ; | \t :` deduped
  * order-preserving; per candidate a quick structure probe rejects
  * single-column parses).
  *
  * Scale note: the probe reads only `probeRows` head lines once via the
  * distributed text reader with an early limit — O(one small task), never
  * a full-file pass per candidate.
  */
object CsvSniffer {

  val DefaultCandidates: Seq[Char] = Seq(',', ';', '|', '\t', ':')
  val ProbeRows = 100

  /** Order-preserving dedup (reference traits.rs:307-333 Vec::unique). */
  def uniqueCandidates(configured: Option[Char]): Seq[Char] =
    (configured.toSeq ++ DefaultCandidates).distinct

  /** Quote-aware field count of one CSV line for a candidate delimiter. */
  def fieldCount(line: String, sep: Char): Int = {
    var count = 1
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') {
        if (inQuotes && i + 1 < line.length && line.charAt(i + 1) == '"') i += 1
        else inQuotes = !inQuotes
      } else if (c == sep && !inQuotes) count += 1
      i += 1
    }
    count
  }

  /** Probe `lines` with a candidate: accepted iff it parses >1 column and
    * every probe row agrees with the header's column count (reference
    * rejects ≤1 column, data_filter.rs:484-531). */
  def probe(lines: Seq[String], sep: Char): Boolean = {
    if (lines.isEmpty) return false
    val header = fieldCount(lines.head, sep)
    header > 1 && lines.forall(fieldCount(_, sep) == header)
  }

  def headLines(spark: SparkSession, path: String, n: Int = ProbeRows): Seq[String] = {
    import scala.jdk.CollectionConverters._
    spark.read.textFile(path).limit(n).collectAsList().asScala.toSeq
  }

  /** First candidate that survives the probe; GraftError if none. */
  def detect(spark: SparkSession, path: String, configured: Option[Char] = None): Char = {
    val lines = headLines(spark, path)
    uniqueCandidates(configured).find(probe(lines, _))
      .getOrElse(throw GraftError.DelimiterNotDetected(path))
  }
}
