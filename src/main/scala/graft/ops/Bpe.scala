package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BpeFns

/** Distributed byte-pair-encoding tokenization — the subword tokenizer a
  * training-data pipeline budgets in (beyond-reference op; the whitespace
  * token ops in [[TextOps]] remain as the cheap pre-tokenizer).
  *
  * Scale shape:
  *   - LEARNING runs on the DISTINCT-WORD frame, not the corpus: one
  *     aggregation builds (word, freq), and every merge round is one
  *     pair-explode + one aggregation over that vocabulary (corpus text is
  *     touched exactly once, vocab ≪ corpus and grows sublinearly). The
  *     only driver state is the ONE winning pair per round and the final
  *     merge list — both bounded by `numMerges`, never a vocabulary.
  *     Lineage is truncated every few rounds (localCheckpoint) so round
  *     M's plan doesn't embed rounds 1..M-1.
  *   - ENCODING is merge-table-driven: the bounded merges list embeds in a
  *     codegen'd expression ([[graft.functions.BpeEncodeExpr]]), applied to
  *     DISTINCT words only; occurrences join the encoded vocabulary back
  *     (one shuffle on `word`, broadcast when small — AQE decides).
  *
  * Word model: lowercase [a-z0-9]+ runs (ASCII-only by construction, so the
  * marker-delimited SQL rendering of the oracle can never collide with
  * symbol text). No end-of-word sentinel — merges never cross word
  * boundaries, and token counts are per-word sums either way; documented
  * divergence from tokenizers that mark word endings.
  */
object Bpe {

  val WordPattern = "[a-z0-9]+"

  /** Byte-level pre-tokenization: whitespace-delimited runs, case and
    * script preserved (raw bytes ARE the alphabet — lowercasing would
    * bake locale-dependent Unicode case folding into the byte stream).
    * `\S` is ASCII-whitespace-complement in both Java regex and RE2, so
    * the DuckDB oracle segments identically.
    */
  val ByteWordPattern = "\\S+"

  /** One row per word OCCURRENCE: (idCol, word). Byte mode keeps raw
    * whitespace-delimited runs; word mode keeps lowercase ASCII
    * alphanumeric runs (the marker-delimited oracle rendering relies on
    * symbol text never colliding with the control-char markers — hex pairs
    * and [a-z0-9] both satisfy that).
    */
  def words(docs: DataFrame, idCol: String, textCol: String,
      byteLevel: Boolean = false): DataFrame = {
    // function API, not expr(): the \S in ByteWordPattern must reach the
    // regex engine verbatim, and SQL string literals eat the backslash
    val (src, pat) =
      if (byteLevel) (col(textCol), ByteWordPattern)
      else (lower(col(textCol)), WordPattern)
    docs.select(col(idCol),
        explode(regexp_extract_all(src, lit(pat), lit(0))).as("word"))
      .where(col("word") =!= "")
  }

  /** [[words]] with the word's 0-based position in its document:
    * (idCol, wpos, word) — the order-preserving occurrence stream sequence
    * packing consumes.
    */
  def wordsPos(docs: DataFrame, idCol: String, textCol: String,
      byteLevel: Boolean = false): DataFrame = {
    val (src, pat) =
      if (byteLevel) (col(textCol), ByteWordPattern)
      else (lower(col(textCol)), WordPattern)
    docs.select(col(idCol),
        posexplode(regexp_extract_all(src, lit(pat), lit(0)))
          .as(Seq("wpos", "word")))
      .where(col("word") =!= "")
  }

  /** The distinct-word frame with occurrence counts: (word, freq). */
  def wordFreq(docs: DataFrame, idCol: String, textCol: String,
      byteLevel: Boolean = false): DataFrame =
    words(docs, idCol, textCol, byteLevel)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The word→symbol-sequence decomposition learning runs on: single
    * characters (word mode) or UTF-8 bytes as uppercase hex pairs (byte
    * mode — `hex(encode(word))` chunked in twos, exactly DuckDB's
    * `hex(encode(word))` rendering, so oracles re-derive the same
    * alphabet).
    */
  private def symsCol(byteLevel: Boolean) =
    if (byteLevel)
      expr("regexp_extract_all(hex(encode(word, 'UTF-8')), '..', 0)")
    else filter(split(col("word"), ""), x => x =!= "")

  /** Learn `numMerges` merge rules by iterative pair counting. Per round:
    * explode adjacent symbol pairs weighted by word frequency, aggregate,
    * take the (count desc, left, right) top-1 — a ONE-ROW collect — apply
    * the rule to the vocabulary map-side, repeat. Stops early when the best
    * pair's count falls below `minCount` (subword-nmt's stopping rule).
    * Returns rules in rank order.
    */
  def learnMerges(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, minCount: Long = 2L, checkpointEvery: Int = 8,
      batchLimit: Int = 64, byteLevel: Boolean = false): Seq[(String, String)] =
    learnMergesFromWordFreq(wordFreq(docs, idCol, textCol, byteLevel),
      numMerges, minCount, checkpointEvery, batchLimit,
      byteLevel = byteLevel)

  /** Learn from an already-aggregated (word, freq) frame. The word-freq
    * table is the EXACT sufficient statistic for BPE learning (pair counts
    * are Σ freq(word) × pairs-in-word), which is what makes incremental
    * maintenance exact: merge per-batch word counts, relearn from the
    * merged state — never re-tokenize the corpus
    * ([[graft.streaming.BpeMaintainer]]).
    *
    * BATCHED rounds: one pair aggregation can safely yield MANY merges, not
    * one — a 32k-merge production vocabulary must not cost 32k sequential
    * driver round-trips. Per round the ranked pair list is scanned greedily
    * and a prefix is accepted under rules that make the batch PROVABLY
    * order-equivalent to applying the same rules in as many sequential
    * rounds (`batchLimit = 1` degenerates to the classic loop):
    *
    *   1. accepted pairs are mutually SYMBOL-DISJOINT — merging (l,r)
    *      only changes counts of pairs sharing l or r (their occurrences
    *      overlap a merged occurrence), so each accepted pair still holds
    *      its measured count at its virtual sequential step;
    *   2. the scan STOPS AT THE FIRST CONFLICT — every pair whose count
    *      can decrease, and every bound on a merge's OFFSPRING pairs
    *      (count(X, lr) ≤ count(X, l); count(lr, Y) ≤ count(r, Y);
    *      count(lr, lr) ≤ count(r, l) — each bounding pair shares a symbol
    *      with (l,r)), then sits at or below the conflict's count;
    *   3. a SELF-pair (l,l) is the one case where an offspring's bounding
    *      pair is the accepted pair itself: greedy left-to-right merging of
    *      an m-run leaves ≤ ⌈count/2⌉ offspring adjacencies ((ll,ll) and
    *      trailing (ll,l)), so ⌈count(l,l)/2⌉ joins the bound;
    *   4. accepted pairs after the first must exceed the bound STRICTLY —
    *      a residual pair tie resolves by rank order exactly like the
    *      sequential tie-break, but an offspring tie would compare against
    *      a symbol string that did not exist at ranking time.
    *
    * Rule 2 is TIGHT, not conservative: a pair ranked below the first
    * conflict cannot be accepted soundly from pair counts alone — the
    * conflicting pair's count may have decreased by as little as zero
    * occurrences (sharing a symbol does not force sharing occurrences), so
    * the sequential argmax at that virtual step could still be the
    * conflicting pair. Proving otherwise needs occurrence-level overlap
    * (triple/quadruple adjacency counts), not the pair table. Exact
    * batching therefore collapses rounds by the conflict-free prefix
    * length (~3-5× on natural alphabets, where top pairs share letters).
    *
    * `exact = false` trades the equivalence guarantee for round count: the
    * scan SKIPS conflicting pairs and keeps accepting lower-ranked disjoint
    * pairs, so a round yields up to `batchLimit` merges (32k merges ≈
    * hundreds of rounds, not 32k). The result is a valid BPE merge table —
    * every rule's operands predate the batch, so rank-order encoding and
    * losslessness hold unchanged — but merge RANKS can deviate from the
    * sequential trainer's wherever a skipped pair would have out-counted a
    * batch-mate after the preceding merges. Gates and specs pin the exact
    * default; the aggressive mode is the documented 100 TB-scale option.
    *
    * BpeSpec checks batched == sequential on fixtures; the bpeprobe
    * harness measures the round collapse at vocabulary scale.
    */
  def learnMergesFromWordFreq(wf: DataFrame, numMerges: Int,
      minCount: Long = 2L, checkpointEvery: Int = 8,
      batchLimit: Int = 64, exact: Boolean = true,
      byteLevel: Boolean = false): Seq[(String, String)] = {
    var vocab = wf
      .select(col("freq"), symsCol(byteLevel).as("syms"))
      .where(size(col("syms")) >= 2)
      .localCheckpoint() // one corpus pass, materialized once
    // the iteration's per-round cost at SMALL vocabularies is pure task
    // overhead (rounds × a 32-task job over a handful of rows) — shrink
    // the layout to one partition when the vocab fits it; large
    // vocabularies keep the distributed layout
    if (vocab.count() < 100000L)
      vocab = vocab.coalesce(1).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var sinceCheckpoint = 0
    var rounds = 0
    var done = false
    while (!done && merges.length < numMerges) {
      rounds += 1
      val want = math.min(batchLimit, numMerges - merges.length)
      // enough ranked rows to always see the first non-accepted pair (the
      // bound) past a full batch; a truncated-list scan that accepts every
      // collected row can only happen on a COMPLETE tiny pair table, where
      // the bound is legitimately zero
      val top = vocab
        .select(col("freq"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("ls"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("rs"))
        .select(col("freq"), explode(arrays_zip(col("ls"), col("rs"))).as("p"))
        .groupBy(col("p.ls").as("l"), col("p.rs").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(want * 3 + 8).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.HashSet.empty[String]
        var selfBound = 0L
        var bound = 0L // count of the first non-accepted ranked pair
        var stop = false
        val it = top.iterator
        while (!stop && it.hasNext) {
          val row = it.next()
          val (l, r, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          if (cnt < minCount) stop = true // sub-minCount pairs never applied
          else if (accepted.length >= want) { bound = cnt; stop = true }
          else if (used(l) || used(r) ||
              (accepted.nonEmpty && cnt <= selfBound)) {
            if (exact) { bound = cnt; stop = true }
            // aggressive mode: skip the conflict, keep scanning — the pair
            // stays in the table for the next round's (updated) ranking
          } else {
            accepted += ((l, r, cnt))
            used += l; used += r
            if (l == r) selfBound = math.max(selfBound, (cnt + 1) / 2)
          }
        }
        // rule 4 (exact mode): the batch head is the true argmax (real
        // tie-break); the tail must beat the bound strictly
        val batch =
          if (exact) accepted.head +:
            accepted.tail.takeWhile(_._3 > math.max(bound, selfBound))
          else accepted.toSeq
        batch.foreach { case (l, r, _) => merges += ((l, r)) }
        // one map-side projection applies the whole batch in rank order
        // (disjoint rules — identical to sequential passes)
        val merged = batch.foldLeft(col("syms")) {
          case (c, (l, r, _)) => BpeFns.mergePassNative(c, l, r)
        }
        vocab = vocab.select(col("freq"), merged.as("syms"))
          .where(size(col("syms")) >= 2)
        // truncate the growing merge-pass chain so a round's aggregation
        // doesn't recompute prior rounds (and codegen stays shallow)
        sinceCheckpoint += batch.length
        if (sinceCheckpoint >= checkpointEvery) {
          vocab = vocab.localCheckpoint()
          sinceCheckpoint = 0
        }
      }
    }
    lastLearnRounds = rounds
    merges.toSeq
  }

  /** Driver round-trips (pair aggregations) of the most recent learn on
    * this thread — diagnostic hook for the batching probe/specs.
    */
  @volatile private[graft] var lastLearnRounds: Int = 0

  /** Rank-ordered merges as a frame (rank, l, r, merged) — the persistable
    * artifact an oracle (or another engine) re-applies. Columns are `l`/`r`
    * rather than left/right so plain SQL needs no keyword quoting.
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r) }
      .toDF("rank", "l", "r", "merged")
  }

  /** Read back a persisted merges table into rank order. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).select("rank", "l", "r")
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Encoded vocabulary: (word, toks ARRAY<STRING>, n_tok). Encoding runs
    * once per DISTINCT word regardless of corpus size.
    */
  def encodeVocab(vocab: DataFrame, merges: Seq[(String, String)],
      byteLevel: Boolean = false): DataFrame =
    vocab.withColumn("toks",
        BpeFns.encodeNative(col("word"), merges, byteLevel))
      .withColumn("n_tok", size(col("toks")))

  /** Per-document BPE token counts: (idCol, n_bpe_tok); zero-word docs kept
    * at 0.
    */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], byteLevel: Boolean = false): DataFrame = {
    val occ = words(docs, idCol, textCol, byteLevel)
    val enc = encodeVocab(occ.select("word").distinct(), merges, byteLevel)
      .select(col("word"), col("n_tok"))
    val counts = occ.join(enc, Seq("word"))
      .groupBy(idCol).agg(sum(col("n_tok")).as("n_bpe_tok"))
    docs.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe_tok"), lit(0L)).as("n_bpe_tok"))
  }

  /** The integer-id vocabulary a training pipeline consumes: alphabet
    * symbols (the corpus's distinct single characters, sorted) take the
    * low ids, merged symbols follow in rank order. Two rules CAN produce
    * the same string (e.g. (a,bc) and (ab,c) both yield "abc"), so every
    * candidate occupies an id slot and duplicate tokens keep their lowest
    * id — deterministic and re-derivable from (corpus chars, merges) alone,
    * which is what makes it oracle-able. Driver state is bounded by
    * |alphabet| + numMerges, never the corpus.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], byteLevel: Boolean = false): Seq[(String, Int)] = {
    val chars = words(docs, idCol, textCol, byteLevel)
      .select(explode(symsCol(byteLevel)).as("c"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    (chars ++ merges.map(p => p._1 + p._2)).zipWithIndex
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
      .toSeq.sortBy(_._2)
  }

  /** Per-document id-space summary: (idCol, n_tok, id_sum, id_min,
    * id_max) over the document's BPE token ids — order-free, so it pins
    * the (encode ∘ vocabulary) composition without needing positional
    * reproduction. Docs with no words: (0, 0, -1, -1).
    */
  def docTokenIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], byteLevel: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = vocabulary(docs, idCol, textCol, merges, byteLevel)
      .toDF("token", "id")
    val occ = words(docs, idCol, textCol, byteLevel)
    val enc = encodeVocab(occ.select("word").distinct(), merges, byteLevel)
      .select(col("word"), col("toks"))
    val perDoc = occ.join(enc, Seq("word"))
      .select(col(idCol), explode(col("toks")).as("token"))
      .join(broadcast(ids), Seq("token"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum(col("id")).as("id_sum"),
        min(col("id")).cast("long").as("id_min"),
        max(col("id")).cast("long").as("id_max"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"),
        coalesce(col("id_min"), lit(-1L)).as("id_min"),
        coalesce(col("id_max"), lit(-1L)).as("id_max"))
  }

  /** Corpus BPE-token frequency, top-N by (count desc, token). */
  def tokenFreq(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], topN: Int,
      byteLevel: Boolean = false): DataFrame = {
    val occ = words(docs, idCol, textCol, byteLevel)
    val enc = encodeVocab(occ.select("word").distinct(), merges, byteLevel)
      .select(col("word"), col("toks"))
    occ.join(enc, Seq("word"))
      .select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
  }
}
