package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) —
  * tokenizer TRAINING as a distributed operator. The classic algorithm
  * is inherently iterative (each merge depends on the counts the
  * previous merge produced), and its Spark-correct shape is exactly
  * the one the original paper trains on: the corpus collapses ONCE to
  * the word-TYPE frame (word, freq) — vocabulary-cardinality, orders
  * of magnitude smaller than the corpus — and every merge round runs
  * on that frame alone. 100 TB of text costs one tokenize+count
  * shuffle; the N merge rounds never touch the corpus again.
  *
  * Representation: a word is its symbol sequence joined by single
  * spaces ("h e l l o"); a merge rewrites the word string with literal
  * left-to-right non-overlapping replacement ("e l" → "el"), which is
  * `replace()` semantics in every SQL engine and quoted-literal
  * `regexp_replace` in Spark — the SAME greedy application order, so
  * an oracle replays training exactly. Pair counts are raw adjacent
  * counts ("a a a" contributes (a,a) twice — the original
  * implementation's counting); argmax ties break on the pair string
  * (bytewise — symbols here are ASCII corpus tokens).
  *
  * Driver involvement per round is ONE collected row (the argmax
  * pair) — bounded by numMerges, the same discipline as the k-means
  * centroid fits. The word frame re-materializes every few rounds so
  * the lineage cannot grow linearly with numMerges (the
  * leakageSafeSplit fixpoint pattern). */
object Bpe {

  /** How many merge rounds ride one materialized lineage segment. */
  private val RematerializeEvery = 4

  /** Spaced symbol sequence of a word: "abc" → "a b c". Explicit
    * per-index substring (not split-on-empty, whose edge behavior
    * differs between engines). */
  private[operators] def spaced(word: org.apache.spark.sql.Column) =
    array_join(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      " ")

  /** Adjacent symbol pairs of a spaced word: "a b c" → ["a b", "b c"];
    * single-symbol words → empty. */
  private[operators] def adjacentPairs(spacedWord: org.apache.spark.sql.Column) = {
    val sy = split(spacedWord, " ")
    when(size(sy) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(sy) - 1),
        j => concat(element_at(sy, j), lit(" "), element_at(sy, j + 1))))
  }

  /** The word-type frame (word spaced, freq) for a corpus — the one
    * corpus-sized pass; everything else iterates on its result. */
  private def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.bm25Words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(spaced(col("w")).as("word"), col("freq"))

  /** Train `numMerges` BPE merges. Returns (rank, pair, merged, cnt)
    * rows in merge order — rank 1 is the first (highest-count) merge;
    * stops early if no adjacent pairs remain. The result is
    * driver-side (≤ numMerges rows by construction). */
  def trainBpeMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1 (got $numMerges)")
    var w = Materialize.once(wordTypes(docs, textCol), eager = true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val best = w.select(explode(adjacentPairs(col("word"))).as("pr"), col("freq"))
        .groupBy("pr").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pr")).limit(1)
        .collect() // exactly one row per round, numMerges rounds — bounded
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((r, pair, merged, cnt))
        val next = w
          .select(regexp_replace(col("word"),
              lit(Pattern.quote(pair)), lit(Matcher.quoteReplacement(merged)))
            .as("word"), col("freq"))
          .groupBy("word").agg(sum("freq").as("freq"))
        w = if (r % RematerializeEvery == 0) Materialize.once(next, eager = true)
            else next
        r += 1
      }
    }
    merges.result()
  }

  /** Apply trained merges (in rank order) to a corpus: one map-side
    * pass, no shuffle — each doc's words tokenize independently.
    * Output: (idCol, bpe_tokens: array<string>) where word boundaries
    * are preserved (merges never cross words, as in training). */
  def applyBpeMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spacedWords = transform(TextAnalysis.bm25Words(col(textCol)),
      w => spaced(w))
    val mergedWords = merges.foldLeft(spacedWords) { case (acc, (pair, merged)) =>
      transform(acc, w => regexp_replace(w,
        lit(Pattern.quote(pair)), lit(Matcher.quoteReplacement(merged))))
    }
    docs.select(col(idCol),
      flatten(transform(mergedWords, w => split(w, " "))).as("bpe_tokens"))
  }
}
