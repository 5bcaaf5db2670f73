package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Every primitive here is a pure map-side filter on a content-derived hash:
  * no RNG state, no `rand()` (whose draw depends on partitioning and retry
  * order), no shuffle. The same row keeps the same fate on any engine, any
  * partition layout, any run — the property that makes train/eval splits and
  * per-stratum downsampling reproducible and auditable at 100 TB, and lets a
  * DuckDB oracle recompute the exact sample.
  */
object Sampling {

  /** Uniform [0,1) value derived from md5(key): the first 6 hex chars parsed
    * as an integer over 2²⁴. md5 is engine-portable (identical text in Spark
    * and DuckDB) and uniform enough for sampling; 24 bits bounds the rate
    * resolution at ~6e-8, far below any practical sampling rate.
    */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
      .cast("bigint") / lit((1 << 24).toDouble)

  /** Keep each row with probability `rate`, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(hashUniform(col(keyCol)) < lit(rate))

  /** Stratified deterministic sampling: per-stratum rates (e.g. downsample
    * the dominant language, keep the tail) with a default for strata not
    * listed. One pass, no shuffle, no per-stratum job — the rate is just a
    * CASE expression next to the hash filter.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.where(hashUniform(col(keyCol)) < rate)
  }

  /** Weight-proportional deterministic sampling: keep each row with
    * probability min(1, weight × rate), by the same content-hash draw as
    * [[hashSample]] — the quality-weighted corpus downsampler (keep long /
    * high-quality documents preferentially) with the same reproducibility
    * contract: no RNG, engine-portable, partition-independent.
    */
  def weightedHashSample(df: DataFrame, keyCol: String, weightCol: String,
      rate: Double): DataFrame =
    df.where(hashUniform(col(keyCol)) <
      least(lit(1.0), col(weightCol).cast("double") * lit(rate)))

  /** Disjoint deterministic train/eval split: eval = hash in [0, evalRate),
    * train = the rest. Same key ⇒ same side, forever — the contamination
    * guarantee a random split cannot give.
    */
  def trainEvalSplit(df: DataFrame, keyCol: String,
      evalRate: Double): (DataFrame, DataFrame) = {
    val h = hashUniform(col(keyCol))
    (df.where(h >= lit(evalRate)), df.where(h < lit(evalRate)))
  }

  /** Leakage-safe train/eval split: [[trainEvalSplit]]'s determinism PLUS
    * the rule an honest benchmark needs — near-duplicate documents must
    * never straddle the split (a test doc with a train-side near-copy is
    * leaked, and fuzzy dedup AFTER a random split cannot fix it). Every
    * connected component of the near-dup `pairs` graph
    * ([[Dedup.connectedComponents]]) is assigned wholesale by the md5 draw
    * of its REPRESENTATIVE id; singletons draw on their own id, so for a
    * dedup-clean corpus this degenerates to [[trainEvalSplit]] exactly.
    * Returns (idCol, rep_id, is_eval) for every input row.
    *
    * Scale: the component frame is a vanishing fraction of the corpus
    * (only docs with a near-dup pair appear); the join back is one
    * shuffle (broadcast when small), and the draw is map-side.
    */
  def leakSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      evalRate: Double): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("node").as(idCol), col("rep"))
    df.join(comps, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("rep"), col(idCol)).as("rep_id"))
      .withColumn("is_eval", hashUniform(col("rep_id")) < evalRate)
  }

  /** Per-key document cap: keep at most `maxN` rows per `keyCol` group,
    * picked deterministically by the same content-hash draw as
    * [[hashSample]] (md5 of the id, ties broken by the id itself) — the
    * per-domain cap every web-crawl pipeline applies so one mega-site
    * cannot dominate the corpus, with the reproducibility contract of the
    * rest of this module: which rows survive depends only on their ids,
    * never on partition layout.
    *
    * Scale: one shuffle on `keyCol`; the per-group work is a sort-limit
    * inside each hash partition. A pathologically hot key (one domain =
    * half the corpus) serializes that key's sort on one task — for that
    * shape, pre-filter with `hashUniform(id) < maxN × c / est(key count)`
    * to shed the deep tail before the exact window (the filter is
    * map-side; the window then ranks a bounded candidate set).
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
      maxN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxN).drop("__rn")
  }

  /** Deterministic mixture sampling — the domain-mixing step of corpus
    * assembly: given target per-source weights and a total document
    * budget, keep each source's quota = ⌊weight/Σweights × budget⌋ docs,
    * picked in (md5(id), id) order so the draw is identical on any
    * engine, partitioning, or run (the [[capPerKey]] determinism rule).
    * Sources absent from `weights` are dropped; a source short of its
    * quota contributes everything it has — quotas are FIXED, not
    * redistributed, which keeps the op a single windowed pass with one
    * shuffle on the source key and the output a pure function of
    * (corpus, weights, budget).
    */
  def mixtureSample(df: DataFrame, keyCol: String, idCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    val w = mixtureWindow(keyCol, idCol)
    df.withColumn("__q", quotaCol(weights, budget, keyCol))
      .where(col("__q").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__q"))
      .drop("__q", "__rn")
  }

  /** Token-denominated mixture sampling — what training mixtures actually
    * budget: per-source token quotas, docs kept while the source's
    * cumulative token count (inclusive, md5(id) order) stays within
    * quota_s = ⌊w_s/Σw × tokenBudget⌋ (the [[graft.ops.Corpus]]
    * selectWithinBudget boundary rule, per source). Output carries
    * `cum_tok` so the draw is audit-able. Per-source windows shard the
    * cumsum naturally — no global single-partition window.
    */
  def mixtureSampleTokens(df: DataFrame, keyCol: String, idCol: String,
      tokCol: String, weights: Map[String, Double],
      tokenBudget: Long): DataFrame = {
    val w = mixtureWindow(keyCol, idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__q", quotaCol(weights, tokenBudget, keyCol))
      .where(col("__q").isNotNull)
      .withColumn("cum_tok", sum(col(tokCol)).over(w))
      .where(col("cum_tok") <= col("__q"))
      .drop("__q")
  }

  /** TEMPERATURE-SCALED mixture weights derived FROM the corpus — the
    * mT5/XLM-R multilingual sampling rule: w_s ∝ n_s^alpha, so low-
    * resource sources are up-sampled relative to their natural share
    * (alpha = 1 reproduces natural proportions, alpha = 0 uniform;
    * 0.2–0.5 is the published range). Feed the result straight into
    * [[mixtureSample]]/[[mixtureSampleTokens]] — their quota formula
    * normalizes, so unnormalized n^alpha weights are exactly right.
    * Driver state is one row per SOURCE (domains, not documents —
    * bounded by construction, the ivfCentroidsFromDf rule).
    */
  def temperatureWeights(df: DataFrame, keyCol: String, tokCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    df.groupBy(col(keyCol)).agg(sum(col(tokCol).cast("long")).as("__n"))
      .collect()
      .map(r => r.getString(0) -> math.pow(r.getLong(1).toDouble, alpha))
      .toMap
  }

  private def mixtureWindow(keyCol: String, idCol: String) = {
    import org.apache.spark.sql.expressions.Window
    Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
  }

  private def quotaCol(weights: Map[String, Double], budget: Long,
      keyCol: String) = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0) &&
      weights.values.sum > 0.0, "weights must be non-negative, not all zero")
    val total = weights.values.sum
    element_at(typedLit(weights.view.mapValues(w =>
      math.floor(w / total * budget).toLong).toMap), col(keyCol))
  }
}
