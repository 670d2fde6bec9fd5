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

  /** Probe `lines` with a candidate: accepted iff the MODAL field count
    * across the probe rows is > 1 (ties prefer the higher count). The
    * reference rejects only ≤ 1 parsed column and then reads permissively
    * with missing_is_null (data_filter.rs:484-531) — so a ragged CSV
    * (trailing fields omitted on some rows) must still detect; PERMISSIVE
    * read null-pads the short rows. Requiring every row to match the
    * header (the previous rule) was stricter than the reference. The
    * modal vote still rejects a wrong delimiter that happens to split
    * only the header. */
  def probe(lines: Seq[String], sep: Char): Boolean = {
    if (lines.isEmpty) return false
    val counts = lines.map(fieldCount(_, sep))
    val modal = counts.groupBy(identity).maxBy { case (c, g) => (g.size, c) }._1
    modal > 1
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
