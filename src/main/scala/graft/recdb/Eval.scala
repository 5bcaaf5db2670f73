package graft.recdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the Spark form of the reference's accuracy
  * harness (PostgreSQL/moviedata/MovieLens1M/acc_test.c: top-k RECOMMEND vs a
  * held-out file, hit-rate at k). Used as the metric-based correctness gate
  * for methods whose training is not bitwise-reproducible (SVD/ALS,
  * SURVEY.md §7.3 hard part (b)).
  */
object Eval {

  /** Deterministic per-user holdout split: for each user, the `holdoutPerUser`
    * highest-(rating, item) events become test, the rest train. Pure column
    * logic — one window shuffle, no sampling nondeterminism.
    */
  def holdoutSplit(events: DataFrame, c: EventCols,
      holdoutPerUser: Int = 1): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(c.user))
      .orderBy(col(c.rating).desc, col(c.item).desc)
    val ranked = events.withColumn("__rn", row_number().over(w))
    val test = ranked.where(col("__rn") <= holdoutPerUser).drop("__rn")
    val train = ranked.where(col("__rn") > holdoutPerUser).drop("__rn")
    (train, test)
  }

  /** Hit-rate@k: fraction of held-out (user, item) events whose item appears
    * in the user's top-k recommendations. `scores` = (user, item, score) as
    * produced by [[Scoring]]; items already rated in train are excluded from
    * the ranking (the standard eval protocol; the reference's "rate all
    * items" output is filtered the same way by its harness loop).
    */
  def hitRateAtK(scores: DataFrame, train: DataFrame, test: DataFrame,
      c: EventCols, k: Int): Double = {
    import org.apache.spark.sql.expressions.Window
    val unseen = scores.join(
      train.select(col(c.user), col(c.item)), Seq(c.user, c.item), "anti")
    val w = Window.partitionBy(col(c.user))
      .orderBy(col("score").desc, col(c.item))
    val topk = unseen.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col(c.user), col(c.item))
    val hits = test.select(col(c.user), col(c.item))
      .join(topk, Seq(c.user, c.item), "semi").count()
    val total = test.count()
    if (total == 0) 0.0 else hits.toDouble / total
  }

  /** NDCG@k with binary relevance (held-out items are the relevant set):
    * per user, DCG = Σ 1/log2(rank+1) over held-out items found in the
    * top-k (train items excluded from the ranking), IDCG = the same sum for
    * a perfect ordering of min(k, |holdout_u|) items; returns mean
    * DCG/IDCG over users with ≥1 held-out item.
    */
  def ndcgAtK(scores: DataFrame, train: DataFrame, test: DataFrame,
      c: EventCols, k: Int): Double = {
    import org.apache.spark.sql.expressions.Window
    val unseen = scores.join(
      train.select(col(c.user), col(c.item)), Seq(c.user, c.item), "anti")
    val w = Window.partitionBy(col(c.user))
      .orderBy(col("score").desc, col(c.item))
    val topk = unseen.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col(c.user), col(c.item), col("__rk"))
    val dcg = test.select(col(c.user), col(c.item))
      .join(topk, Seq(c.user, c.item))
      .groupBy(col(c.user))
      .agg(sum(lit(1.0) / log2(col("__rk") + 1)).as("dcg"))
    val ideal = test.groupBy(col(c.user))
      .agg(count(lit(1)).as("nrel"))
      .select(col(c.user),
        // Σ_{i=1..min(k,nrel)} 1/log2(i+1) via a bounded sequence aggregate
        aggregate(sequence(lit(1), least(col("nrel"), lit(k))),
          lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
          .as("idcg"))
    val joined = ideal.join(dcg, Seq(c.user), "left")
      .select((coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
    val row = joined.agg(avg(col("ndcg"))).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }
}
