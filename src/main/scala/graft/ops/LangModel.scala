package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the KenLM-style quality
  * filter of LLM data pipelines, reduced to its dataflow core: train bigram
  * conditional probabilities on the corpus itself and score every document
  * by its mean log-probability. Low scores = atypical/garbled text; the
  * score feeds the same thresholding as [[TextOps.qualityScore]].
  *
  * p(w2 | w1) = c(w1 w2) / c(w1 ·), both counts over bigram INSTANCES
  * (not distinct shingles — an LM counts occurrences), estimated from the
  * corpus in two hash aggregations; scoring is two equi-joins back onto the
  * instance stream and one per-doc average. Everything shuffles on
  * bounded-cardinality keys (bigram vocabulary), never on documents.
  */
object LangModel {

  /** All bigram instances of split-on-space text, in order, NON-distinct. */
  def bigramInstances(text: Column): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => array_join(slice(toks, i, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** (id, avg_logp, n_bigrams) per document with ≥1 bigram: the mean
    * ln p(w2|w1) under the corpus-estimated bigram model.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The instance stream feeds three consumers (c2 counts, c1 counts, the
    // scoring join); materialize it once instead of re-running the explode
    // per branch. The trained model collapses to ONE vocabulary-sized
    // (bg → ln p) frame joined back in a single (broadcast-eligible) join —
    // scoring shuffles the corpus once on the doc id, never on vocabulary.
    val inst = graft.Exec.materialize(docs
      .select(col(idCol).as("id"), explode(bigramInstances(col(textCol))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0)))
    val c2 = inst.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = c2
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(c1, "w1")
      .select(col("bg"), log(col("c2").cast("double") / col("c1")).as("logp"))
    inst
      .join(model, "bg")
      .groupBy(col("id"))
      .agg(avg(col("logp")).as("avg_logp"), count(lit(1)).as("n_bigrams"))
  }

  /** Held-out perplexity filtering — the CCNet-style LM quality gate
    * (Wenzek et al. 2020): train the bigram model on a REFERENCE SPLIT of
    * the corpus (md5(id) first hex digit < '8' ≈ a deterministic,
    * engine-portable 50%), then score EVERY document by its mean negative
    * log-likelihood under add-one smoothing and keep those at or below
    * `keepBelow`. Unlike [[bigramLogProb]] (self-trained, unsmoothed —
    * unseen bigrams silently drop), the held-out model must score unseen
    * events: p(w2|w1) = (c(w1 w2)+1) / (c(w1)+V), V = trained first-word
    * vocabulary size, so every bigram gets a finite score and atypical
    * text is penalized rather than ignored.
    *
    * Returns (id, avg_nll, n_bigrams, kept); `avg_nll` rounded to 6 and
    * the threshold applied to the ROUNDED value, so the kept set is
    * reproducible bit-for-bit across engines.
    *
    * Scale: identical dataflow to [[bigramLogProb]] — the model is one
    * vocabulary-sized frame, V is a one-row aggregate joined as a scalar,
    * and scoring shuffles the corpus once on the doc id.
    */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
      keepBelow: Double = 4.0): DataFrame = {
    val inst = graft.Exec.materialize(docs
      .select(col(idCol).as("id"), explode(bigramInstances(col(textCol))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("__train",
        substring(md5(col("id").cast("string")), 1, 1) < "8"))
    val train = inst.where(col("__train"))
    val c2 = train.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vdf = c1.agg(count(lit(1)).as("__v"))
    val scored = inst
      .join(c2, Seq("bg"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vdf))
      .select(col("id"),
        // greatest(…, 1): a degenerate corpus whose md5 train split is
        // EMPTY (V = 0, possible only on a handful of docs) scores
        // against a unit denominator instead of dividing by zero; any
        // real corpus has a train side and is unaffected
        log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          greatest(coalesce(col("c1"), lit(0L)) + col("__v"),
            lit(1L))).as("logp"))
    scored.groupBy("id")
      .agg(round(-avg(col("logp")), 6).as("avg_nll"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("kept", col("avg_nll") <= keepBelow)
  }

  /** [[perplexityScore]] with a DYNAMIC threshold — keep the best
    * `keepFrac` of documents by perplexity, the way production filters
    * are actually specified (a corpus-relative budget, not a magic
    * constant). The cutoff is the exact interpolated `keepFrac`-quantile
    * of the ROUNDED scores (a scalar aggregate broadcast back), so the
    * kept set is a pure function of the corpus: reproducible across
    * engines, partitionings, and runs.
    */
  def perplexityFilterTopFrac(docs: DataFrame, idCol: String,
      textCol: String, keepFrac: Double = 0.5): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac must be in (0,1]")
    val scoredAll = perplexityScore(docs, idCol, textCol)
      .select(col("id"), col("avg_nll"), col("n_bigrams"))
    val cut = scoredAll.agg(
      expr(s"percentile(avg_nll, $keepFrac)").as("__cut"))
    scoredAll.crossJoin(broadcast(cut))
      .select(col("id"), col("avg_nll"), col("n_bigrams"),
        round(col("__cut"), 6).as("cutoff"),
        (col("avg_nll") <= round(col("__cut"), 6)).as("kept"))
  }
}
