package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of web-scale
  * curation (the role fastText plays in CCNet/LLaMA-style pipelines),
  * reduced to the distributed-dataflow core that stays EXACTLY
  * reproducible: a multinomial Naive Bayes over unigram tokens. All
  * sufficient statistics are integer counts (class priors, per-class
  * token counts, vocabulary size), the model is one vocabulary-sized
  * frame, and scoring is one join + one per-doc sum of logs — the same
  * shape, cost, and oracle story as [[LangModel.perplexityScore]].
  *
  * Training labels are WEAK labels from the rule-based
  * [[TextOps.qualityScore]] (≥ 0.5 = positive) on the deterministic
  * md5-half split — the standard bootstrap when no human labels exist:
  * rules label a seed set, the classifier generalizes beyond the rules'
  * blind spots. Swapping in real labels changes one column.
  */
object Classify {

  /** (id, llr, n_tokens, predicted) for every document: llr = log
    * P(doc|+) + log P(+) − log P(doc|−) − log P(−) under add-one
    * smoothing over the TRAIN vocabulary; `predicted` thresholds the
    * 6-rounded llr at 0 so the decision is engine-reproducible.
    */
  def nbQualityScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__t"))
      .withColumn("__label", TextOps.qualityScore(col("__t")) >= 0.5)
      .withColumn("__train",
        substring(md5(col("id").cast("string")), 1, 1) < "8")
    val toks = graft.Exec.materialize(base
      .select(col("id"), col("__label"), col("__train"),
        explode(TextOps.tokens(col("__t"))).as("tok"))
      .where(col("tok") =!= ""))
    val train = toks.where(col("__train"))
    // class-conditional token counts + per-class totals + priors + |V| —
    // every statistic an integer, every frame vocabulary- or scalar-sized
    val tokCounts = train.groupBy("tok")
      .agg(sum(when(col("__label"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__label"), 1L).otherwise(0L)).as("c_neg"))
    val totals = train.agg(
      sum(when(col("__label"), 1L).otherwise(0L)).as("t_pos"),
      sum(when(!col("__label"), 1L).otherwise(0L)).as("t_neg"),
      countDistinct(when(col("__label"), col("id"))).as("d_pos"),
      countDistinct(when(!col("__label"), col("id"))).as("d_neg"))
    val vdf = tokCounts.agg(count(lit(1)).as("v"))
    def lp(c: Column, t: Column, v: Column): Column =
      log((c + 1).cast("double") / (t + v))
    val scored = toks
      .join(tokCounts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vdf))
      .select(col("id"),
        (lp(coalesce(col("c_pos"), lit(0L)), col("t_pos"), col("v")) -
          lp(coalesce(col("c_neg"), lit(0L)), col("t_neg"), col("v")))
          .as("__dllr"),
        // Laplace-smoothed class prior ratio, constant per row
        (log((col("d_pos") + 1).cast("double")) -
          log((col("d_neg") + 1).cast("double"))).as("__dprior"))
    scored.groupBy("id")
      .agg(round(first(col("__dprior")) + sum(col("__dllr")), 6).as("llr"),
        count(lit(1)).as("n_tokens"))
      .withColumn("predicted", col("llr") > 0.0)
  }
}
