package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The rename-only stage-and-swap discipline shared by every writer
  * that replaces a live directory with a freshly committed one
  * ([[Writers.compactParquet]], [[graft.streaming.EventStreams.upsertSink]]):
  *
  *   write staging → rename(target → retired) → rename(staging →
  *   target) → delete retired.
  *
  * At every instant a COMPLETE copy of the data exists under some name
  * (renames are atomic per directory; a recursive delete of the live
  * target could be half-done at a crash, and no recovery can
  * distinguish a mutilated directory from a complete one), so a crash
  * at any point loses nothing and [[recover]] restores the live path
  * from whichever complete copy survived. Safety-critical and easy to
  * get subtly wrong — which is why it lives in exactly one place.
  *
  * ONE WRITER PER TARGET at a time: staging/retired names are fixed
  * per target and [[recover]] deletes what it finds under them, so two
  * concurrent swappers on the same path can destroy each other's
  * in-flight staging or promote a stale retired copy. Callers must
  * serialize swaps per path (documented on each public entry point);
  * this is the same single-maintainer-per-table discipline every
  * table-format compactor assumes. */
private[graft] object FsSwap {

  /** A parquet job commit writes `_SUCCESS` — the marker that separates
    * a COMPLETE staging directory from one whose write was killed
    * midway. */
  def committed(fs: FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, "_SUCCESS"))

  /** Rename that THROWS on failure — `FileSystem.rename` returning
    * false (target parent missing, cross-volume, …) must never be
    * mistaken for success in a swap. */
  def mv(fs: FileSystem, from: Path, to: Path, ctx: String): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"$ctx: rename $from -> $to failed")

  /** Entry-time CRASH RECOVERY from a previous swap killed at any
    * point. Only ever deletes a directory when a complete copy survives
    * elsewhere:
    *
    *   - retired + target            → crash after the second rename:
    *                                   target is complete; drop retired.
    *   - retired + committed staging → crash between the renames:
    *                                   finish the swap.
    *   - retired alone               → restore the original.
    *   - staging without `_SUCCESS`  → torn write; discard (target or
    *                                   the empty-start path is
    *                                   authoritative).
    *   - committed staging alone     → crash after write, before swap;
    *                                   discarded by the final delete —
    *                                   correct only when the caller can
    *                                   re-derive the staged content
    *                                   (compaction re-reads the live
    *                                   dir; the upsert source replays
    *                                   the batch into an idempotent
    *                                   merge). */
  def recover(fs: FileSystem, target: Path, staging: Path, retired: Path,
      ctx: String): Unit = {
    if (fs.exists(retired)) {
      if (fs.exists(target)) { fs.delete(retired, true); () }
      else if (fs.exists(staging) && committed(fs, staging)) {
        mv(fs, staging, target, ctx)
        fs.delete(retired, true)
        ()
      } else mv(fs, retired, target, ctx)
    }
    if (fs.exists(staging)) { fs.delete(staging, true); () }
  }

  /** The swap itself: retire the live target (if any), promote the
    * committed staging, drop the retired copy. Call only after the
    * staging write committed. */
  def swap(fs: FileSystem, target: Path, staging: Path, retired: Path,
      ctx: String): Unit = {
    if (fs.exists(target)) mv(fs, target, retired, ctx)
    mv(fs, staging, target, ctx)
    if (fs.exists(retired)) { fs.delete(retired, true); () }
  }

  // ---- multi-part artifact commit marker --------------------------------

  /** Terminal marker for MULTI-part on-disk artifacts (the persisted
    * ANN indexes write 2–3 sibling directories — centroids, codebooks,
    * codes). Each part's own `_SUCCESS` only proves that PART committed;
    * nothing ties the parts together, so a build killed between parts
    * (or a failed overwrite of an existing index) leaves a READABLE but
    * INCONSISTENT artifact — new model, old codes. The marker closes
    * that window: deleted FIRST on rebuild, written LAST after every
    * part committed, required by every reader. */
  val CommitMarker = "_graft_index_commit"

  /** Call before the first part write of a (re)build: drops the marker
    * so a torn rebuild can never pass for the old complete artifact. */
  def beginArtifact(fs: FileSystem, dir: Path): Unit = {
    val m = new Path(dir, CommitMarker)
    if (fs.exists(m)) { fs.delete(m, false); () }
  }

  /** Call after the LAST part write committed; `info` (build params)
    * lands in the marker for post-mortem debugging. */
  def commitArtifact(fs: FileSystem, dir: Path, info: String): Unit = {
    val out = fs.create(new Path(dir, CommitMarker), true)
    try out.write((info + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Readers call this before trusting any part of the artifact. */
  def requireCommitted(fs: FileSystem, dir: Path, ctx: String): Unit =
    if (!fs.exists(new Path(dir, CommitMarker)))
      throw new java.io.IOException(
        s"$ctx: no $CommitMarker under $dir — the index is absent, " +
          "mid-build, or a torn rebuild left inconsistent parts; rebuild it")
}
