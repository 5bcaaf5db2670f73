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

  /** Deterministic negative sampling — the implicit-feedback trainer's
    * companion op (BPR/contrastive losses pair every positive with unseen
    * items): for each user, the first `k` UNRATED items in the
    * engine-portable md5((user,item)) order, so the same negatives come out
    * on any engine, any layout, any run (the [[graft.ops.Sampling]]
    * reproducibility contract).
    *
    * This exact form materializes users × items before the anti-join —
    * correct and oracle-able, and the right tool when the item catalog is
    * dimension-table-sized. For corpus-scale catalogs use
    * [[negativeSamplesRejection]].
    */
  def negativeSamples(events: DataFrame, c: EventCols, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = events.select(col(c.user)).distinct()
    val items = events.select(col(c.item)).distinct()
    val neg = users.crossJoin(items)
      .join(events.select(col(c.user), col(c.item)).distinct(),
        Seq(c.user, c.item), "anti")
    val w = Window.partitionBy(col(c.user))
      .orderBy(md5(concat_ws(":", col(c.user), col(c.item))), col(c.item))
    neg.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .select(col(c.user), col(c.item), col("__rn").cast("long").as("neg_rank"))
  }

  /** Negative sampling at catalog scale: instead of users × items, each user
    * draws `trials` candidate item INDEXES by hashing (user, trial) into the
    * catalog (items get a dense, deterministic id-order index — one
    * window pass), candidates join back to item ids, rated pairs are
    * anti-joined away, and the first `k` per user in draw order survive.
    * Linear in users × trials with no cross product; `trials` only needs to
    * beat k + the user's rated count by a collision margin (hash draws are
    * ~uniform, so trials = 4k + maxRated is already generous).
    *
    * Sampling is WITH collisions dropped (duplicate draws of one item keep
    * the first), mirroring rejection sampling; a user can come up short of
    * `k` only if trials is set too low for their rated count.
    */
  def negativeSamplesRejection(events: DataFrame, c: EventCols, k: Int,
      trials: Int = 64): DataFrame =
    negativeSamplesFromDraws(negativeDraws(events, c, trials), events, c, k)

  /** The hash-draw half of [[negativeSamplesRejection]]: each user's
    * `trials` candidate draws, collision-dropped (earliest trial per
    * (user, item) kept), BEFORE the rated-pair anti-join. Output
    * (user, item, __t) — persistable, so an oracle can re-derive the rest
    * of the pipeline from the identical draws (xxhash64 itself has no
    * cross-engine twin; isolating it here is the SVD-factor gate pattern).
    */
  def negativeDraws(events: DataFrame, c: EventCols,
      trials: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    // dense deterministic id-order index without a global single-partition
    // window: sort stays distributed, zipWithIndex stitches the per-partition
    // offsets (one extra count job — the standard distributed dense-rank)
    val base = events.select(col(c.item)).distinct().orderBy(col(c.item))
    val items = spark.createDataFrame(
      base.rdd.zipWithIndex.map { case (row, i) =>
        org.apache.spark.sql.Row(row(0), i)
      },
      base.schema.add("__idx", org.apache.spark.sql.types.LongType))
    val nItems = items.count()
    val users = events.select(col(c.user)).distinct()
    val cand = users
      .select(col(c.user), explode(sequence(lit(0), lit(trials - 1))).as("__t"))
      .select(col(c.user), col("__t"),
        pmod(xxhash64(col(c.user), col("__t")), lit(nItems)).as("__idx"))
    val wd = Window.partitionBy(col(c.user), col(c.item)).orderBy(col("__t"))
    cand.join(items, Seq("__idx"))
      // collision drop: keep each (user, item)'s earliest draw
      .withColumn("__dup", row_number().over(wd)).where(col("__dup") === 1)
      .select(col(c.user), col(c.item), col("__t"))
  }

  /** Rated-pair anti-join + first-k-in-draw-order over a draws frame
    * ((user, item, __t) — from [[negativeDraws]] live, or read back from a
    * persisted artifact).
    */
  def negativeSamplesFromDraws(draws: DataFrame, events: DataFrame,
      c: EventCols, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(c.user)).orderBy(col("__t"))
    draws
      .join(events.select(col(c.user), col(c.item)).distinct(),
        Seq(c.user, c.item), "anti")
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .select(col(c.user), col(c.item), col("__rn").cast("long").as("neg_rank"))
  }
}
