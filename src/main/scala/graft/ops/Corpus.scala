package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The composed corpus-cleaning pipeline a training-data run actually
  * executes — quality gate → language filter → exact dedup → near-dup group
  * collapse — expressed over the operators in this package so every stage
  * inherits their scale design (native expressions, LSH candidates, label
  * propagation). Returns the kept corpus plus per-stage survivor counts
  * (each count is one action; the pipeline is expected to be run, not
  * embedded in a larger lazy plan).
  */
object Corpus {

  final case class CleanStats(input: Long, afterQuality: Long,
      afterLang: Long, afterExact: Long, afterNearDup: Long)

  /** Clean `docs`, keeping one representative (min id) per duplicate group.
    *
    * @param minQuality   keep docs with [[TextOps.qualityScore]] ≥ this
    * @param langs        keep docs whose [[TextOps.langId]] is in this set
    *                     (empty = keep all languages)
    * @param nGram        word-shingle size for near-dup detection
    * @param threshold    near-dup Jaccard threshold
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.5, langs: Seq[String] = Seq("en"),
      nGram: Int = 3, threshold: Double = 0.8): (DataFrame, CleanStats) = {
    val input = docs.count()

    val q = docs.where(TextOps.qualityScore(col(textCol)) >= minQuality)
    val afterQuality = q.count()

    val lf = if (langs.isEmpty) q
      else q.where(TextOps.langId(col(textCol)).isin(langs: _*))
    val afterLang = lf.count()

    // exact dedup on the 128-bit content key: keep each group's min id
    val reps = Dedup.exactByHash(lf, textCol, idCol).select(col(idCol))
    val ex = lf.join(reps, Seq(idCol), "semi").cache()
    val afterExact = ex.count()

    // near-dup groups via LSH pairs + label propagation; drop non-reps.
    // Representatives of different components are non-adjacent by
    // transitivity, so no pair at `threshold` survives the collapse
    // (CorpusSpec asserts this).
    val pairs = Dedup.minhashLshPairs(ex, idCol, textCol,
      nGram = nGram, threshold = threshold)
    val comps = Dedup.connectedComponents(pairs)
    val drop = comps.where(col("node") =!= col("rep"))
      .select(col("node").as(idCol))
    val kept = ex.join(drop, Seq(idCol), "anti")
    val afterNearDup = kept.count()

    (kept, CleanStats(input, afterQuality, afterLang, afterExact, afterNearDup))
  }

  /** Benchmark decontamination: for every (corpus doc, eval doc) pair that
    * shares at least one distinct word n-gram, the number of shared n-grams —
    * the standard train/test-overlap audit run before every pretraining job
    * (n = 8..13 word-gram overlap).
    *
    * Scale shape: the eval set is small by construction (a benchmark), so
    * its exploded n-grams get an explicit broadcast — the corpus side
    * streams map-side through the join with NO shuffle of corpus grams; the
    * only shuffle is the pair aggregation, bounded by actually-contaminated
    * pairs. Shingle expressions stay inline in the explode (see
    * [[Dedup.jaccardPairs]]).
    */
  def contaminationPairs(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val cg = Dedup.widen(
        corpus.select(col(idCol).as("corpus_id"), col(textCol).as("__t")),
        "corpus_id")
      .select(col("corpus_id"),
        explode(TextFns.wordShinglesNative(col("__t"), n)).as("g"))
    val eg = evalDocs.select(col(idCol).as("eval_id"), col(textCol).as("__t"))
      .select(col("eval_id"),
        explode(TextFns.wordShinglesNative(col("__t"), n)).as("g"))
    cg.join(broadcast(eg), Seq("g"))
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Benchmark decontamination as a FILTER (the GPT-3-style rule): a
    * corpus document is dropped when its worst-case n-gram overlap with
    * any single eval document reaches `maxOverlapFrac` of the corpus
    * document's own distinct grams. Built on [[contaminationPairs]] (the
    * audit op); returns EVERY corpus doc with its evidence —
    * (idCol, n_grams, max_shared, overlap_frac, kept) — so the drop is
    * attributable, not silent. Integer-ratio arithmetic throughout
    * (rounded to 6 for the compare); docs too short to shingle share
    * nothing and are kept.
    */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int = 8,
      maxOverlapFrac: Double = 0.1): DataFrame = {
    val grams = corpus.select(col(idCol),
      size(TextFns.wordShinglesNative(col(textCol), n)).cast("long")
        .as("n_grams"))
    val worst = contaminationPairs(corpus, evalDocs, idCol, textCol, n)
      .groupBy(col("corpus_id"))
      .agg(max(col("n_shared")).as("max_shared"))
    val frac = col("max_shared").cast("double") /
      greatest(col("n_grams"), lit(1L))
    grams.join(worst, grams(idCol) === worst("corpus_id"), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"))
      .select(col(idCol), col("n_grams"), col("max_shared"),
        round(frac, 6).as("overlap_frac"),
        (frac < maxOverlapFrac).as("kept"))
  }

  /** BM25-DRIVEN decontamination — the paraphrase-level audit the exact
    * n-gram rule ([[decontaminate]]) cannot do: each eval document queries
    * the corpus's PASSAGE-level BM25 index ([[TextOps.slidingChunks]] +
    * [[TfIdf.bm25SearchBatch]]) with its own distinct terms, and the
    * report lists each eval doc's top-`k` scoring corpus passages with
    * provenance — reworded leakage still shares rare vocabulary even when
    * no 8-gram survives, so it ranks high here while n-gram overlap reads
    * zero. Returns (eval_id, idCol, chunk_idx, score, rank). Scale shape
    * is bm25SearchBatch's: the eval vocabulary is the broadcast dim side,
    * only matching postings shuffle, and ranking is a per-eval-doc
    * partitioned top-k.
    */
  def bm25Decontaminate(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 5, width: Int = 20,
      stride: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // provenance packs as pid = id·100000 + chunk_idx; a doc with ≥100000
    // chunks (~1M tokens at the default width/stride) or an id past
    // Long.MaxValue/100000 would silently collide/overflow and
    // misattribute leakage — fail loudly instead (the raise_error
    // fixed-width key discipline)
    val guarded = when(col("c.chunk_idx") < 100000L &&
        abs(col(idCol).cast("long")) < lit(Long.MaxValue / 100000L),
        col(idCol) * 100000L + col("c.chunk_idx"))
      .otherwise(raise_error(concat(
        lit("bm25Decontaminate: provenance key overflow (id "),
        col(idCol).cast("string"), lit(", chunk_idx "),
        col("c.chunk_idx").cast("string"),
        lit(") — split the document or widen the key"))))
    val passages = corpus.select(col(idCol),
        explode(TextOps.slidingChunks(col(textCol), width, stride)).as("c"))
      .select(guarded.as("pid"), col("c.chunk").as("__ptext"))
    val post = TfIdf.postings(passages, "pid", "__ptext")
    val q = evalDocs.select(col(idCol).as("eval_id"),
      explode(TextOps.tokens(col(textCol))).as("term")).distinct()
    TfIdf.bm25SearchBatch(post, "pid", q, "eval_id", "term", k, k1, b)
      .select(col("eval_id"), expr("pid div 100000").as(idCol),
        (col("pid") % 100000L).as("chunk_idx"), col("score"), col("rank"))
  }

  /** Cross-document boilerplate fraction: for each doc, the share of its
    * DISTINCT word `n`-grams that occur in at least `minDocs` distinct
    * documents corpus-wide — the inter-document cousin of
    * [[TextOps.repetitionRatio]] (which is within-doc) and the signal the
    * C4/Gopher-family quality filters threshold on to drop template/
    * navigation boilerplate. Docs with fewer than `n` tokens have no grams
    * and report fraction 0.0.
    *
    * Scale shape: one shuffle aggregates gram document-frequency; grams
    * reaching `minDocs` are usually few relative to the gram universe
    * (boilerplate is the head of the df distribution), so the boiler-gram
    * set broadcasts back and the per-doc fraction is a map-side semi-probe
    * plus one aggregation on the doc id — corpus text never shuffles twice.
    * The broadcast is guarded, not assumed: the set is counted first (it is
    * cached, so the count is not wasted work) and a template-saturated
    * corpus whose boiler set exceeds `broadcastLimit` falls back to a
    * shuffle join rather than feeding an unbounded frame to the driver.
    */
  def boilerplateFraction(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2,
      broadcastLimit: Long = 5000000L): DataFrame = {
    val grams = Dedup.widen(
        docs.select(col(idCol).as("__id"), col(textCol).as("__t")), "__id")
      .select(col("__id"),
        explode(TextFns.wordShinglesNative(col("__t"), n)).as("g"))
    val boiler = grams.groupBy("g")
      .agg(countDistinct(col("__id")).as("df"))
      .where(col("df") >= minDocs)
      .select("g")
      .cache()
    val boilerSide =
      if (boiler.count() <= broadcastLimit) broadcast(boiler) else boiler
    val frac = grams
      .join(boilerSide.withColumn("__b", lit(1)), Seq("g"), "left")
      .groupBy("__id")
      .agg((sum(when(col("__b").isNotNull, 1L).otherwise(0L)) /
        count(lit(1))).as("boiler_frac"))
    // docs too short to shingle never reach `grams`; restore them at 0.0
    val out = docs.select(col(idCol).as("__id"))
      .join(frac, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("boiler_frac"), lit(0.0)).as("boiler_frac"))
    // the boiler cache lives exactly as long as the caller can still run
    // this result — released on GC, so long-lived sessions don't accumulate
    graft.Exec.releaseOnUnreachable(out, boiler)
  }

  /** Token-budget corpus selection — the data-curation step that picks the
    * best documents that FIT: docs are taken in (quality desc, id) order
    * until the running token total would exceed `budget`. Returns the kept
    * docs with their running total (`cum_tok` ≤ budget).
    *
    * The global prefix sum is computed WITHOUT a single-partition window:
    * range-repartition on the order key keeps the sort distributed, the
    * per-partition token totals (≤ `buckets` rows) prefix-sum on the driver,
    * and each partition's window adds its driver-computed offset. The kept
    * set is a pure function of the global (quality desc, id) order — range
    * boundary placement cannot change it.
    */
  def selectWithinBudget(docs: DataFrame, idCol: String, tokensCol: String,
      qualityCol: String, budget: Long, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    // localCheckpoint, NOT cache: the driver-computed offsets are baked
    // into the plan per __pid, so the partitions the window later reads
    // must be the EXACT materialized ones — a cache eviction would silently
    // recompute, and range-boundary sampling + intra-partition row order
    // after upstream shuffles are not guaranteed stable across recomputes
    // (a mismatch would corrupt cum_tok, not fail). Checkpoint blocks are
    // freed by the ContextCleaner when the result's plan is GC'd.
    val keyed = docs.select(col(idCol), col(tokensCol).cast("long").as("__tok"),
        (-col(qualityCol).cast("double")).as("__nq"))
      .repartitionByRange(buckets, col("__nq"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partSums = keyed.groupBy("__pid").agg(sum(col("__tok")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets).scanLeft(0L) {
      case (acc, pid) => acc + partSums.getOrElse(pid, 0L)
    }
    // array literal, not a per-bucket when(lit,lit) chain: the chain baked
    // 64 per-call offsets into the generated source, recompiling a fresh
    // class every call (the [[Packing.prefixOffsetsTotal]] note); the
    // array rides the codegen references array, so the source — and the
    // compiled class — is shared across calls, and lookup is O(1)
    val offCol = element_at(lit(offsets.init.toArray), col("__pid") + 1)
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__nq"), col(idCol))
    keyed.withColumn("cum_tok", sum(col("__tok")).over(w) + offCol)
      .where(col("cum_tok") <= budget)
      .select(col(idCol), col("cum_tok"))
  }

  /** DATASET-VERSION DIFF between two manifest snapshots — the corpus-
    * release audit: which documents entered, which left, which survived,
    * and whether a survivor's position moved. Selection at 100 TB is
    * corpus-RELATIVE (quality ranks, dedup winners, token budgets), so
    * ingesting new data retroactively evicts previously-selected
    * documents; the diff is the artifact a release pipeline publishes
    * alongside the new manifest so downstream consumers know exactly what
    * to invalidate. Inputs are any two (idCol, cmpCol) selections; output
    * is one row per id present in either: (idCol, status ∈
    * added|removed|kept, old_val, new_val, changed) — changed is true for
    * added/removed and for kept ids whose cmpCol moved. One full outer
    * join keyed on the id — a single shuffle, no window, no collect.
    */
  def manifestDiff(oldSel: DataFrame, newSel: DataFrame, idCol: String,
      cmpCol: String): DataFrame = {
    // status derives from ROW PRESENCE (explicit flags), not value
    // nullness: a kept id whose cmpCol is legitimately NULL on one side
    // must read as kept-with-changed, never as added/removed
    val o = oldSel.select(col(idCol), col(cmpCol).as("old_val"),
      lit(true).as("__po"))
    val n = newSel.select(col(idCol), col(cmpCol).as("new_val"),
      lit(true).as("__pn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .otherwise("kept").as("status"),
        col("old_val"), col("new_val"),
        (col("__po").isNull || col("__pn").isNull ||
          !(col("old_val") <=> col("new_val"))).as("changed"))
  }

  /** TOKEN-DISTRIBUTION DRIFT between two corpus versions — the release
    * monitor paired with [[manifestDiff]]: the top word-probability movers
    * between the old and new corpus, with each mover's contribution to
    * KL(new‖old). Laplace-smoothed over the UNION vocabulary (so a token
    * absent from one side gets a finite, deterministic probability), all
    * floats rounded to 6 decimals, ordered by |Δp| then word — a
    * reproducible drift table a pipeline can alert on before a tokenizer
    * or mixture silently shifts under a new crawl.
    *
    * Scale shape: two word-count aggregations (map-side combined), one
    * full outer join on the word, a single-row totals aggregate broadcast
    * back, and a top-N via global sort-limit (TakeOrderedAndProject — N
    * rows per partition, never a global window).
    */
  def tokenDrift(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String, topN: Int = 30): DataFrame =
    tokenDriftFromCounts(
      Bpe.words(oldDocs, idCol, textCol)
        .groupBy("word").agg(count(lit(1)).as("freq")),
      Bpe.words(newDocs, idCol, textCol)
        .groupBy("word").agg(count(lit(1)).as("freq")),
      topN)

  /** [[tokenDrift]] from already-aggregated (word, freq) tables — the
    * form the STREAMING word-frequency state serves directly
    * ([[graft.streaming.BpeMaintainer.stateWordFreq]]), so drift between
    * two ingest horizons costs two state reads, never a corpus re-scan.
    */
  def tokenDriftFromCounts(oldCounts: DataFrame, newCounts: DataFrame,
      topN: Int = 30): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val co = oldCounts.select(col("word"), col("freq").as("n_old"))
    val cn = newCounts.select(col("word"), col("freq").as("n_new"))
    val u = co.join(cn, Seq("word"), "full_outer")
      .select(col("word"), coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = u.agg(sum(col("n_old")).as("__so"), sum(col("n_new")).as("__sn"),
      count(lit(1)).as("__v"))
    val pOld = (col("n_old") + 1).cast("double") / (col("__so") + col("__v"))
    val pNew = (col("n_new") + 1).cast("double") / (col("__sn") + col("__v"))
    u.crossJoin(broadcast(tot))
      .withColumn("delta", round(pNew - pOld, 6))
      .orderBy(abs(col("delta")).desc, col("word"))
      .limit(topN)
      .select(col("word"), col("n_old"), col("n_new"),
        round(pOld, 6).as("p_old"), round(pNew, 6).as("p_new"),
        col("delta"), round(pNew * log(pNew / pOld), 6).as("kl_term"))
  }

  /** Total KL(new‖old) between two (word, freq) tables — the SCALAR the
    * drift-triggered maintenance loop thresholds
    * ([[graft.streaming.CurateMaintainer.processBatchDriftTriggered]]);
    * [[tokenDriftFromCounts]] is its per-word diagnostic view. Same
    * Laplace smoothing over the union vocabulary; one full-outer join +
    * one aggregate — cost ∝ vocabulary, never the corpus. An EMPTY old
    * side yields KL against the uniform prior — small for a near-uniform
    * corpus — so a maintenance loop must fire its FIRST derivation
    * unconditionally rather than lean on this value.
    */
  def klTotal(oldCounts: DataFrame, newCounts: DataFrame): Double = {
    val co = oldCounts.select(col("word"), col("freq").as("n_old"))
    val cn = newCounts.select(col("word"), col("freq").as("n_new"))
    val u = co.join(cn, Seq("word"), "full_outer")
      .select(coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = u.agg(sum(col("n_old")).as("__so"),
      sum(col("n_new")).as("__sn"), count(lit(1)).as("__v"))
    val pOld = (col("n_old") + 1).cast("double") / (col("__so") + col("__v"))
    val pNew = (col("n_new") + 1).cast("double") / (col("__sn") + col("__v"))
    u.crossJoin(broadcast(tot))
      .agg(coalesce(sum(pNew * log(pNew / pOld)), lit(0.0)))
      .head().getDouble(0)
  }

  /** The modern curation pipeline end to end, one call — the composition a
    * user of this engine actually ships:
    *
    *   1. Gopher rule filter ([[TextOps.gopherAudit]], stopword floor 1) —
    *      format/repetition garbage out first, it is the cheapest stage;
    *   2. exact dedup (min-id representative per identical text);
    *   3. exact-substring span REMOVAL within the survivors
    *      ([[Dedup.removeSpans]]) — cross-document boilerplate cut, not
    *      just flagged;
    *   4. held-out bigram-LM perplexity filter on the CLEANED text
    *      ([[LangModel.perplexityScore]]) — scored after removal so
    *      boilerplate cannot buy a doc a good score;
    *   5. token-budget selection ([[selectWithinBudget]]) in
    *      (perplexity asc, id) order.
    *
    * Returns (idCol, n_tok, avg_nll, cum_tok) for the selected docs.
    * Stage order is load-bearing and each stage is the already-gated
    * operator — this wrapper adds joins, not semantics.
    *
    * `bpeMerges`: when supplied, the budget stage counts tokens under the
    * learned BPE model ([[Bpe.docTokenCounts]] over the CLEANED text,
    * optionally byte-level) instead of whitespace words — the denomination
    * a trainer actually budgets in, and the byte mode is what makes the
    * budget correct on multilingual corpora.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 30, pplKeepBelow: Double = 3.43,
      tokenBudget: Long = 6000L,
      bpeMerges: Option[Seq[(String, String)]] = None,
      byteLevel: Boolean = false,
      repsOpt: Option[DataFrame] = None,
      spansOpt: Option[DataFrame] = None): DataFrame =
    curateCore(docs, idCol, textCol, width, pplKeepBelow, tokenBudget,
      bpeMerges, byteLevel, repsOpt, spansOpt)
      .select(col(idCol), col("n_tok"), col("avg_nll"), col("cum_tok"))

  /** [[curate]] carrying each selected doc's CLEANED text — the frame
    * downstream tokenize/pack stages consume ([[trainManifest]]).
    * `repsOpt`/`spansOpt`: the same incremental-derivation hooks as
    * [[curate]] (streamed state supplies dedup reps and duplicated spans).
    */
  def curateWithText(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 30, pplKeepBelow: Double = 3.43,
      tokenBudget: Long = 6000L,
      repsOpt: Option[DataFrame] = None,
      spansOpt: Option[DataFrame] = None): DataFrame =
    curateCore(docs, idCol, textCol, width, pplKeepBelow, tokenBudget,
      None, false, repsOpt, spansOpt)

  private def curateCore(docs: DataFrame, idCol: String, textCol: String,
      width: Int, pplKeepBelow: Double, tokenBudget: Long,
      bpeMerges: Option[Seq[(String, String)]],
      byteLevel: Boolean,
      repsOpt: Option[DataFrame],
      spansOpt: Option[DataFrame]): DataFrame = {
    val audit = TextOps.gopherAudit(docs, idCol, textCol, minStopwords = 1)
    // `passed` feeds both the dedup-rep build and the survivor join;
    // `cleaned` feeds both the LM scoring and the token recount — each is
    // materialized once so the expensive upstream (window-digest dedup
    // especially) never re-runs per consumer.
    // `repsOpt`/`spansOpt` are the incremental-derivation hooks
    // ([[graft.streaming.CurateMaintainer]]): when the dedup
    // representatives and duplicated spans have already been derived from
    // persisted streaming state, the two expensive corpus scans (content
    // hashing, window digesting) are skipped and only the cheap stages
    // (gopher recompute, span cuts, LM scoring, budget) run here.
    // derived mode reads state dirs that are REWRITTEN out of band between
    // derivations (batch overwrite, replay, LSM fold): its intermediates
    // must materialize cache-UNMATCHABLE (localCheckpoint), or a later
    // derivation would plan-match this one's cached entry and chase the
    // previous write's part files. One-shot mode keeps CacheManager
    // materialization — its plans read only the immutable corpus, and
    // cross-gate plan matching legitimately shares the expensive stages.
    val derived = repsOpt.isDefined || spansOpt.isDefined
    def mat(df: DataFrame): DataFrame =
      if (derived) graft.Exec.materializeLocal(df) else graft.Exec.materialize(df)
    val passed0 = docs.select(col(idCol), col(textCol))
      .join(audit.where(col("fail_mask") === 0).select(col(idCol)), Seq(idCol))
    // fully-derived mode (both reps and spans from state) consumes
    // `passed` exactly once (the survivor semi-join) — materializing it
    // paid an extra eager pass + checkpoint per derivation for reuse
    // that never happens. One-shot/partial modes keep it: there `passed`
    // also feeds the exact-dedup rep build (and span windowing).
    val passed =
      if (repsOpt.isDefined && spansOpt.isDefined) passed0 else mat(passed0)
    val reps = repsOpt.getOrElse(
      Dedup.exact(passed, Seq(textCol), idCol).select(col(idCol)))
    val surv = passed.join(reps, Seq(idCol), "semi")
    val cleaned = mat(spansOpt match {
      case Some(sp) => Dedup.removeSpansGiven(surv, idCol, textCol, sp)
      case None => Dedup.removeSpans(surv, idCol, textCol, width)
    })
    val scored = LangModel.perplexityScore(cleaned, idCol, "clean_text",
      pplKeepBelow)
    val tokCounts = bpeMerges match {
      case Some(m) =>
        Bpe.docTokenCounts(cleaned, idCol, "clean_text", m, byteLevel)
          .select(col(idCol), col("n_bpe_tok").as("n_tok"))
      case None => cleaned.select(col(idCol),
        size(split(col("clean_text"), " ")).cast("long").as("n_tok"))
    }
    val withTok = cleaned
      .join(scored.where(col("kept"))
        .select(col("id").as(idCol), col("avg_nll")), Seq(idCol))
      .join(tokCounts, Seq(idCol))
      .select(col(idCol), col("n_tok"), col("avg_nll"))
    val out = selectWithinBudget(
        withTok.withColumn("__q", -col("avg_nll")),
        idCol, "n_tok", "__q", tokenBudget)
      .join(withTok, Seq(idCol))
      .join(cleaned.select(col(idCol), col("clean_text")), Seq(idCol))
      .select(col(idCol), col("n_tok"), col("avg_nll"),
        col("cum_tok").cast("long").as("cum_tok"), col("clean_text"))
    graft.Exec.releaseOnUnreachable(
      graft.Exec.releaseOnUnreachable(out, passed), cleaned)
  }

  /** Raw corpus → TRAINING BATCHES, one call: curate (gopher → exact
    * dedup → span removal → perplexity filter → token budget), id-encode
    * the selected docs' CLEANED text under the learned merges, pack into
    * fixed-length sequences ([[Packing.packTokenIds]] — EOS terminators,
    * distributed prefix-sum offsets), and assign the deterministic
    * per-epoch training order ([[Packing.epochOrder]]). Every stage is
    * the already-gated operator; the composition is what a trainer's
    * data loader actually consumes. Returns one row per
    * (epoch, sequence): (epoch, seq_id, ord, n_tok, n_docs, id_sum,
    * doc_min, doc_max).
    */
  def trainManifest(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], seqLen: Int = 128,
      epochs: Int = 2, width: Int = 30, pplKeepBelow: Double = 3.43,
      tokenBudget: Long = 6000L, byteLevel: Boolean = false): DataFrame =
    trainManifestFrom(
      curateWithText(docs, idCol, textCol, width, pplKeepBelow, tokenBudget)
        .select(col(idCol), col("clean_text").as(textCol)),
      idCol, textCol, merges, seqLen, epochs, byteLevel)

  /** Shard layout over a training manifest: each epoch's ordered
    * sequences map to fixed-size shards (the trainer's on-disk file
    * layout — shard = the unit a data-loader worker reads). Pure
    * arithmetic over the already-deterministic order, so shard
    * assignment is reproducible anywhere. (epoch, shard_id, n_seqs,
    * n_tok).
    */
  def shardManifest(manifest: DataFrame, shardSize: Int): DataFrame = {
    require(shardSize >= 1, "shardSize must be >= 1")
    manifest.groupBy(col("epoch"),
        floor(col("ord") / shardSize).cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_tok")).as("n_tok"))
  }

  /** MATERIALIZE the shard layout: one parquet file per (epoch, shard)
    * under `dir` — the data-loader handoff artifact [[shardManifest]] only
    * describes. `epochOrd` is [[Packing.epochOrder]]'s (epoch, seq_id,
    * ord); `payload` is [[Packing.packTokenIdRows]]'s (seq_id, ids_str,
    * n_tok). Rows land hive-partitioned (epoch=…/shard_id=…), exactly one
    * file per shard (the repartition key IS the directory key), sequences
    * in ord order within the file — partitionBy's required sort is a
    * prefix of the sortWithinPartitions key, so no re-sort reorders them.
    */
  def writeShards(epochOrd: DataFrame, payload: DataFrame, shardSize: Int,
      dir: String): Unit = {
    require(shardSize >= 1, "shardSize must be >= 1")
    val spark = epochOrd.sparkSession
    epochOrd.select(col("epoch"), col("seq_id"), col("ord"),
        floor(col("ord") / shardSize).cast("long").as("shard_id"))
      .join(payload.select(col("seq_id"), col("ids_str"), col("n_tok")),
        Seq("seq_id"))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism / 2),
        col("epoch"), col("shard_id"))
      .sortWithinPartitions(col("epoch"), col("shard_id"), col("ord"))
      .write.mode("overwrite").partitionBy("epoch", "shard_id").parquet(dir)
  }

  /** Re-read a [[writeShards]] layout: (epoch, shard_id, seq_id, ord,
    * n_tok, ids_str) with the partition-directory keys normalized to the
    * manifest's types.
    */
  def readShards(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("epoch").cast("int").as("epoch"),
        col("shard_id").cast("long").as("shard_id"),
        col("seq_id"), col("ord"), col("n_tok"), col("ids_str"))

  /** DECODE the persisted shard layout back to per-document text — the
    * loader-side invertibility audit: (shard payloads + the attention-mask
    * boundary sidecar + the integer vocabulary) are SUFFICIENT to
    * reconstruct every selected document's normalized character stream
    * exactly, so the on-disk training artifacts are a lossless encoding of
    * the corpus they were cut from. Epoch 1 only (every epoch carries the
    * same payload). Output per document: (idCol, n_tok, recon_md5,
    * lossless) — n_tok excludes the EOS terminator; lossless compares the
    * reconstruction against `sel`'s live text re-normalized through the
    * same word regex the encoder used.
    *
    * Scale shape: payload rows explode to (seq_id, pos, id); document
    * attribution is a seq-LOCAL range probe against the boundary sidecar
    * (both sides shuffle on seq_id; spans per sequence are bounded by
    * seqLen); the id→token map is a broadcast (|alphabet| + merges rows);
    * reassembly groups on idCol — per-group state is one document's
    * tokens, bounded by document length like every per-doc text op here.
    */
  def detokenizeShards(spark: org.apache.spark.sql.SparkSession,
      dir: String, bounds: DataFrame, sel: DataFrame, idCol: String,
      textCol: String, vocab: Seq[(String, Int)], seqLen: Int): DataFrame = {
    import spark.implicits._
    require(seqLen > 0, "seqLen must be positive")
    val eosId = vocab.map(_._2).max.toLong + 1
    val ids = vocab.toDF("token", "tid")
      .select(col("token"), col("tid").cast("long").as("tid"))
    val toks = readShards(spark, dir).where(col("epoch") === 1)
      .select(col("seq_id"), posexplode(split(col("ids_str"), ":")))
      .select(col("seq_id"), col("pos").cast("int").as("p"),
        col("col").cast("long").as("tid"))
    val attributed = toks
      .join(bounds.select(col("seq_id"), col(idCol), col("start_pos"),
        col("n_tok_in_seq")), Seq("seq_id"))
      .where(col("p") >= col("start_pos") &&
        col("p") < col("start_pos") + col("n_tok_in_seq"))
      .where(col("tid") =!= eosId)
      .join(broadcast(ids), Seq("tid"))
    val rec = attributed.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        array_join(transform(array_sort(collect_list(struct(
            (col("seq_id") * seqLen + col("p")).as("g"), col("token")))),
          x => x.getField("token")), "").as("recon"))
    rec.join(sel.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col("n_tok"), md5(col("recon")).as("recon_md5"),
        (col("recon") === array_join(
          regexp_extract_all(lower(col(textCol)), lit(Bpe.WordPattern),
            lit(0)), "")).as("lossless"))
  }

  /** Raw corpus → SHARD FILES ON DISK, one call: curate, id-encode + pack
    * the cleaned selection (payload rows carrying every token id), assign
    * the deterministic epoch order, and [[writeShards]] the result; returns
    * the re-read layout so callers consume what is actually on disk. The
    * conservation gate recomputes token counts and id sums FROM the
    * persisted payload — a writer that dropped or reordered bytes cannot
    * pass.
    */
  def trainShards(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], dir: String, seqLen: Int = 128,
      epochs: Int = 2, width: Int = 30, pplKeepBelow: Double = 3.43,
      tokenBudget: Long = 6000L, shardSize: Int = 2,
      byteLevel: Boolean = false): DataFrame =
    trainShardsFrom(graft.Exec.materializeLocal(
        curateWithText(docs, idCol, textCol, width, pplKeepBelow, tokenBudget)
          .select(col(idCol), col("clean_text").as(textCol))),
      idCol, textCol, merges, dir, seqLen, epochs, shardSize, byteLevel)

  /** [[trainShards]]' pack + order + write tail over an already-curated
    * (idCol, textCol) selection (the [[trainManifestFrom]] split — callers
    * holding a memoized selection skip the curate stage).
    */
  def trainShardsFrom(sel: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], dir: String, seqLen: Int,
      epochs: Int, shardSize: Int, byteLevel: Boolean = false): DataFrame = {
    // payload feeds both the epoch-order build and the shard join; the
    // curate-derived lineage must not recompute (nor cache-poison —
    // the CurateMaintainer localCheckpoint rule)
    val payload = graft.Exec.materializeLocal(
      Packing.packTokenIdRows(sel, idCol, textCol, merges, seqLen, byteLevel))
    val ord = Packing.epochOrder(payload.select(col("seq_id")), "seq_id",
      epochs)
    writeShards(ord, payload, shardSize, dir)
    readShards(sel.sparkSession, dir)
  }

  /** INTERLEAVED MULTIMODAL training manifest: [[trainManifest]]'s
    * curate → pack → epoch-order composition with each selected document's
    * paired image spliced into its token stream as DISCRETE image tokens —
    * the PQ codes of the image's real decoded embedding, offset into the
    * image region of the vocabulary (VQ-style tokenization: text ids
    * 0..V-1, EOS = V, image token for (subspace j, code c) = V+1+j·k+c).
    * Pairing is `doc_id % |media|` (the alignment key is given in a crawl
    * pipeline; the modulus is the deterministic fixture stand-in). The
    * byte-packing discipline applies cross-modally: image tokens are just
    * tokens — same grid, same offsets, same sequence cuts, same epoch
    * permutation.
    *
    * `codebooks` is the persisted PQ codebook ([[Ann.pqCodebookDf]] shape)
    * so any engine re-derives the image tokens from the artifact alone;
    * codes assign on round(d, 6) for cross-engine argmin parity.
    */
  def trainManifestMultimodal(docs: DataFrame, media: DataFrame,
      idCol: String, textCol: String, merges: Seq[(String, String)],
      codebooks: Array[Array[Array[Double]]], seqLen: Int = 128,
      epochs: Int = 2, width: Int = 30, pplKeepBelow: Double = 3.43,
      tokenBudget: Long = 6000L, embDim: Int = 8,
      embSeed: Long = 42L): DataFrame = {
    trainManifestMultimodalFrom(graft.Exec.materializeLocal(
        curateWithText(docs, idCol, textCol, width, pplKeepBelow, tokenBudget)
          .select(col(idCol), col("clean_text").as(textCol))),
      media, idCol, textCol, merges, codebooks, seqLen, epochs, embDim,
      embSeed)
  }

  /** [[trainManifestMultimodal]]'s splice + pack + order tail over an
    * already-curated selection.
    */
  def trainManifestMultimodalFrom(sel: DataFrame, media: DataFrame,
      idCol: String, textCol: String, merges: Seq[(String, String)],
      codebooks: Array[Array[Array[Double]]], seqLen: Int, epochs: Int,
      embDim: Int = 8, embSeed: Long = 42L): DataFrame = {
    val seqs = Packing.packTokenIdsInterleaved(sel, idCol, textCol, merges,
      seqLen, mmImgPrefix(sel, media, idCol, codebooks, embDim, embSeed))
    Packing.epochOrder(seqs.select(col("seq_id")), "seq_id", epochs)
      .join(seqs, Seq("seq_id"))
      .select(col("epoch"), col("seq_id"), col("ord"), col("n_tok"),
        col("n_docs"), col("id_sum"), col("doc_min"), col("doc_max"))
  }

  /** The per-doc image-token stream behind the multimodal manifest/shards:
    * pair (doc_id % |media|), PQ-encode each paired image's real decoded
    * embedding (rounded argmin — engine-reproducible), explode codes to
    * (idCol, tpos, img_ord = subspace·k + code).
    */
  private def mmImgPrefix(sel: DataFrame, media: DataFrame, idCol: String,
      codebooks: Array[Array[Array[Double]]], embDim: Int,
      embSeed: Long): DataFrame = {
    val nMedia = media.count()
    require(nMedia > 0, "multimodal packing: media frame is empty")
    val kCodes = codebooks.head.length
    val codes = Ann.pqEncode(
        Multimodal.imageEmbedding(media, embDim, embSeed),
        "media_id", "embedding", codebooks, assignOnRoundedTo = Some(6))
      .select(col("id").as("media_id"), col("codes"))
    sel.select(col(idCol), (col(idCol) % nMedia).as("media_id"))
      .join(codes, Seq("media_id"))
      .select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col(idCol), (col("sub") + 1).as("tpos"),
        (col("sub") * kCodes + col("code")).as("img_ord"))
  }

  /** [[trainShards]] for the INTERLEAVED MULTIMODAL stream: the persisted
    * shard payloads carry the image tokens in-line with the text, so the
    * on-disk handoff artifact is the full cross-modal training stream.
    * Returns the re-read layout.
    */
  def trainShardsMultimodal(docs: DataFrame, media: DataFrame,
      idCol: String, textCol: String, merges: Seq[(String, String)],
      codebooks: Array[Array[Array[Double]]], dir: String,
      seqLen: Int = 128, epochs: Int = 2, width: Int = 30,
      pplKeepBelow: Double = 3.43, tokenBudget: Long = 6000L,
      shardSize: Int = 2, embDim: Int = 8, embSeed: Long = 42L): DataFrame = {
    trainShardsMultimodalFrom(graft.Exec.materializeLocal(
        curateWithText(docs, idCol, textCol, width, pplKeepBelow, tokenBudget)
          .select(col(idCol), col("clean_text").as(textCol))),
      media, idCol, textCol, merges, codebooks, dir, seqLen, epochs,
      shardSize, embDim, embSeed)
  }

  /** [[trainShardsMultimodal]]'s tail over an already-curated selection. */
  def trainShardsMultimodalFrom(sel: DataFrame, media: DataFrame,
      idCol: String, textCol: String, merges: Seq[(String, String)],
      codebooks: Array[Array[Array[Double]]], dir: String, seqLen: Int,
      epochs: Int, shardSize: Int, embDim: Int = 8,
      embSeed: Long = 42L): DataFrame = {
    val payload = graft.Exec.materializeLocal(
      Packing.packTokenIdRowsInterleaved(sel, idCol, textCol, merges,
        seqLen, mmImgPrefix(sel, media, idCol, codebooks, embDim, embSeed)))
    val ord = Packing.epochOrder(payload.select(col("seq_id")), "seq_id",
      epochs)
    writeShards(ord, payload, shardSize, dir)
    readShards(sel.sparkSession, dir)
  }

  /** MULTIMODAL curriculum: the interleaved sequences ordered text-first —
    * epoch 1 ranks ascending by image-token count (pure-text warmup before
    * image-heavy sequences, the modality-mixing schedule), later epochs
    * the md5 shuffle ([[Packing.curriculumOrder]] over the spliced grid).
    * Returns (epoch, seq_id, ord, n_img).
    */
  def mmCurriculumFrom(sel: DataFrame, media: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      codebooks: Array[Array[Array[Double]]], seqLen: Int, epochs: Int,
      embDim: Int = 8, embSeed: Long = 42L): DataFrame = {
    val seqs = graft.Exec.materializeLocal(
      Packing.packTokenIdsInterleaved(sel, idCol, textCol, merges, seqLen,
          mmImgPrefix(sel, media, idCol, codebooks, embDim, embSeed))
        .select(col("seq_id"), col("n_img")))
    Packing.curriculumOrder(seqs, "seq_id", "n_img", epochs)
      .join(seqs, Seq("seq_id"))
      .select(col("epoch"), col("seq_id"), col("ord"), col("n_img"))
  }

  /** Attention-mask sidecar of the INTERLEAVED multimodal grid: each doc's
    * span covers its image tokens + text + EOS ([[Packing.packBoundaries]]
    * over the spliced stream).
    */
  def mmBoundariesFrom(sel: DataFrame, media: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      codebooks: Array[Array[Array[Double]]], seqLen: Int,
      embDim: Int = 8, embSeed: Long = 42L): DataFrame =
    Packing.packBoundariesInterleaved(sel, idCol, textCol, merges, seqLen,
      mmImgPrefix(sel, media, idCol, codebooks, embDim, embSeed))

  /** [[trainManifest]]'s pack + epoch-order tail over an already-curated
    * (idCol, textCol) selection — split out so the streamed derivation
    * ([[graft.streaming.CurateMaintainer.manifest]]) shares it verbatim.
    */
  def trainManifestFrom(selIn: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], seqLen: Int, epochs: Int,
      byteLevel: Boolean = false): DataFrame = {
    // packing consumes the selection in several branches (vocabulary
    // alphabet collect, distinct-word encode, per-doc EOS union) — each
    // would re-run the whole curate tail (including LM scoring) without
    // this; localCheckpoint so a state-derived selection stays
    // cache-unmatchable (the CurateMaintainer rule)
    val sel = graft.Exec.materializeLocal(selIn)
    val seqs = Packing.packTokenIds(sel, idCol, textCol, merges, seqLen,
      byteLevel)
    Packing.epochOrder(seqs.select(col("seq_id")), "seq_id", epochs)
      .join(seqs, Seq("seq_id"))
      .select(col("epoch"), col("seq_id"), col("ord"), col("n_tok"),
        col("n_docs"), col("id_sum"), col("doc_min"), col("doc_max"))
  }
}
