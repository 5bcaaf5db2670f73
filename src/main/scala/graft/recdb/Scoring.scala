package graft.recdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prediction formulas — the Spark re-expression of RecDB's RecScan tuple
  * generator (execRecommend.c:302-595) plus the per-method predict functions
  * (SURVEY.md §2.1 R12-R15).
  *
  * Output schema mirrors the synthesized tuples: one row per (user, item) pair
  * for EVERY qualifying user with ≥1 event and EVERY item in the events table —
  * including items the user already rated ("we rate all items",
  * recathon.c:3945-3958, SURVEY.md §2.3 #1). Users with zero events are
  * naturally absent (inner-join semantics replace the reference's per-user
  * WARNING skip, recathon.c:3894).
  *
  * The optional `users` frame is the reference's user-qual pre-filter
  * (execRecommend.c:442-468, SURVEY.md §4.2.4): predicates on the user key are
  * applied BEFORE the user×item expansion and before any per-user aggregation,
  * pruning the heavy work to the qualifying users. Note the item dimension
  * always comes from the FULL events table — filtering users must not shrink
  * the item universe.
  *
  * Scale design: the heavy aggregation shuffles on model keys only. The
  * `users` pre-filter frame is structurally small (it exists because a
  * predicate selected few users) and keeps an explicit broadcast hint; every
  * unbounded dimension (per-user averages, the item dimension, factor
  * frames) is left unhinted so AQE picks broadcast only when the runtime
  * size allows — a forced broadcast of a 1e9-row dimension would OOM the
  * driver on a real cluster.
  */
object Scoring {

  /** Expand a triangular model to both directions for scoring sweeps —
    * replaces the reference's two-half probe (recathon.c:4025-4079).
    */
  def symmetric(model: DataFrame, c1: String, c2: String): DataFrame =
    model.select(col(c1).as("i"), col(c2).as("j"), col("similarity").as("s"))
      .unionAll(
        model.select(col(c2).as("i"), col(c1).as("j"), col("similarity").as("s")))

  /** itemCF: score(u,i) = Σ_{j∈rated(u)} sim(i,j)·r(u,j) / Σ|sim|
    * (recathon.c:4235-4295). Item with no rated neighbors → 0 (recathon.c:4291).
    */
  def itemCF(ratings: DataFrame, itemModel: DataFrame,
      c: EventCols = EventCols(), users: Option[DataFrame] = None): DataFrame = {
    val uRatings = restrict(ratings, users, c)
    val sym = symmetric(itemModel, "item1", "item2")
    val scores = sym
      .join(uRatings.select(col(c.user).as("u"), col(c.item).as("j"),
        col(c.rating).as("r")), Seq("j"))
      .groupBy("u", "i")
      .agg((sum(col("s") * col("r")) / sum(abs(col("s")))).as("score"))
    expansion(uRatings, ratings, c)
      .join(scores, Seq("u", "i"), "left")
      .select(col("u").as(c.user), col("i").as(c.item),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** userCF: score(u,i) = ū + Σ_{v∈raters(i)} sim(u,v)·(r(v,i) − ū) / Σ|sim|,
    * where ū is **u's own** average — the reference's documented quirk vs the
    * standard Resnick formula (recathon.c:4349-4360, SURVEY.md §2.1 R13).
    * No similar raters → 0.0, not ū (recathon.c:4357).
    */
  def userCF(ratings: DataFrame, userModel: DataFrame,
      c: EventCols = EventCols(), users: Option[DataFrame] = None): DataFrame = {
    val uRatings = restrict(ratings, users, c)
    val uavg = uRatings.groupBy(col(c.user).as("u"))
      .agg(avg(col(c.rating)).as("ubar"))
    val sym0 = symmetric(userModel, "user1", "user2")
      .select(col("i").as("u"), col("j").as("v"), col("s"))
    val sym = users match {
      case Some(u) =>
        sym0.join(broadcast(u.select(col(c.user).as("u")).distinct()), Seq("u"), "semi")
      case None => sym0
    }
    val scores = sym
      .join(ratings.select(col(c.user).as("v"), col(c.item).as("i"),
        col(c.rating).as("r")), Seq("v"))
      .join(uavg, Seq("u"))
      .groupBy("u", "i", "ubar")
      .agg((col("ubar") +
        sum(col("s") * (col("r") - col("ubar"))) / sum(abs(col("s")))).as("score"))
      .drop("ubar")
    expansion(uRatings, ratings, c)
      .join(scores, Seq("u", "i"), "left")
      .select(col("u").as(c.user), col("i").as(c.item),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** SVD / matrix-factorization: score(u,i) = dot(userF[u], itemF[i]) — no
    * baseline at inference (recathon.c:4373-4433, SURVEY.md §2.1 R14).
    * Factor frames: (id, features ARRAY<numeric>). The cross join is left
    * unhinted — AQE broadcasts the item side when it is actually small.
    */
  def factorScore(userFactors: DataFrame, itemFactors: DataFrame,
      c: EventCols = EventCols()): DataFrame = {
    val uf = userFactors.select(col("id").as(c.user),
      col("features").cast("array<double>").as("ufeat"))
    val itf = itemFactors.select(col("id").as(c.item),
      col("features").cast("array<double>").as("ifeat"))
    uf.crossJoin(itf)
      .select(col(c.user), col(c.item),
        aggregate(
          zip_with(col("ufeat"), col("ifeat"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("score"))
  }

  /** Events restricted to qualifying users (broadcast semi-join). */
  private def restrict(ratings: DataFrame, users: Option[DataFrame],
      c: EventCols): DataFrame = users match {
    case Some(u) => ratings.join(broadcast(u.select(c.user).distinct()), Seq(c.user), "semi")
    case None => ratings
  }

  /** The RecScan output frame: qualifying users that have ≥1 event × ALL items
    * in the events table (execRecommend.c:302-595).
    */
  private def expansion(uRatings: DataFrame, allRatings: DataFrame,
      c: EventCols): DataFrame = {
    val users = uRatings.select(col(c.user).as("u")).distinct()
    val items = allRatings.select(col(c.item).as("i")).distinct()
    users.crossJoin(items)
  }
}
