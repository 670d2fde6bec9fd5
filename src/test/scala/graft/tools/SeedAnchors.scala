package graft.tools

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Seeds ANCHORS.json records for one scale from a `graft.Bench` full
  * artifact (the `bench_full_latest.json` shape), via the same
  * canonical writer the scripted re-anchor mode uses — so a
  * single-shot probe's numbers enter the anchor file in exactly the
  * format every parser (and the round-15 BenchRenderSpec pins) relies
  * on, instead of by hand-editing.
  *
  *   Test/runMain graft.tools.SeedAnchors bench_full_latest.json 100 2026-08-16
  *
  * Only gates measured OK in the artifact (sec >= 0) are written;
  * existing records for the scale are replaced per-gate, all other
  * scales preserved verbatim (Bench.updateAnchorsFile semantics).
  * Pass a 4th arg `keep-existing` to seed only gates that do NOT
  * already have a record at the scale (probe complements an earlier
  * wave without touching its measurements).
  */
object SeedAnchors {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: SeedAnchors <bench_full.json> <sfLabel> <date> [keep-existing]")
    val artifact = java.nio.file.Paths.get(args(0))
    val sf = args(1)
    val date = args(2)
    val keepExisting = args.length > 3 && args(3) == "keep-existing"
    val j = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(artifact), "UTF-8"))
    val measured: Map[String, Double] = (j \ "queries") match {
      case JObject(fields) => fields.collect {
        case (name, JDouble(sec)) if sec >= 0 => name -> sec
        case (name, JInt(sec)) if sec >= 0 => name -> sec.toDouble
      }.toMap
      case other => sys.error(s"artifact has no queries object: $other")
    }
    val anchorsPath = Seq("ANCHORS.json", "/root/repo/ANCHORS.json")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.isReadable)
      .getOrElse(sys.error("no readable ANCHORS.json"))
    val already: Set[String] =
      if (keepExisting)
        graft.Bench.parseAnchorsJson(
          new String(java.nio.file.Files.readAllBytes(anchorsPath), "UTF-8"), sf).keySet
      else Set.empty
    val toWrite = measured -- already
    val n = graft.Bench.updateAnchorsFile(anchorsPath, sf, toWrite, date)
    println(s"seeded $n sf$sf anchor record(s) into $anchorsPath" +
      (if (already.nonEmpty) s" (${(measured.keySet & already).size} existing kept)" else ""))
  }
}
