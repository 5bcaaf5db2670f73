package graft.recdb

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Matrix-factorization training for method `svd`.
  *
  * The reference trains Funk-SVD with sequential gradient descent — 50
  * features × 100 epochs, lr 0.001, reg 0.002, init 0.1, residual caching
  * (recathon.c:2699-2940, hard constants at recathon.c:2745,2788-2791).
  * That trajectory is inherently sequential; the Spark-native equivalent is
  * ALS at the same rank (documented divergence, SURVEY.md §7.3 "hard parts"
  * (b)): same model family, same inference (dot product, R14), different
  * optimizer. The remaining hyperparameters do NOT carry over one-to-one,
  * deliberately:
  *   - maxIter=10, not 100: one ALS iteration solves the full regularized
  *     least-squares problem for every user and item factor in closed form;
  *     an SGD "epoch" is one lr-0.001 pass over the ratings, so the counts
  *     are not comparable units. Measured on the sf0.01 holdout split
  *     (round 4): (10, 0.05) → train RMSE 0.55 / test 216 in 5.4 s;
  *     the reference constants (100, 0.002) → train RMSE 0.03 / test 220
  *     in 15.2 s — near-exact train interpolation, identical-within-noise
  *     holdout error, 3× the cost, and >50 ALS sweeps needs
  *     setCheckpointDir to avoid a lineage StackOverflow.
  *   - regParam=0.05, not 0.002: ALS regularization is applied per
  *     closed-form solve, not per gradient step, so the SGD value does not
  *     transfer; the measurement above shows 0.002 only buys train-set
  *     interpolation.
  * TRAINING is therefore metric-gated (ranking agreement + RMSE floors,
  * EvalSpec); PREDICTION (the dot product) is hash-gated against a DuckDB
  * oracle over persisted factor tables (r_svd_factor_topk).
  *
  * Output: (userFactors, itemFactors), each (id LONG, features ARRAY<FLOAT>)
  * — the Spark rendering of the reference's (users|items, feature, value)
  * model tables (utility.c:310-317).
  */
object FunkSVD {
  val Rank = 50 // recathon.c:2707 — the reference's feature count
  val Seed = 42L

  def train(events: DataFrame, c: EventCols,
      rank: Int = Rank, maxIter: Int = 10, regParam: Double = 0.05)
      : (DataFrame, DataFrame) = {
    // ALS ids are Int; LONG keys are the engine contract (FIXTURES.md), so
    // out-of-range ids must fail loudly here rather than wrap/throw mid-fit
    val Row(maxU, maxI) = events
      .select(max(abs(col(c.user))), max(abs(col(c.item)))).head()
    def chk(v: Any, which: String): Unit = v match {
      case n: Long if n > Int.MaxValue =>
        throw new IllegalArgumentException(
          s"svd: $which ids exceed Int range (max |id| = $n); " +
            "re-index ids densely before training (ALS limitation)")
      case _ =>
    }
    chk(maxU, "user"); chk(maxI, "item")
    val df = events.select(
      col(c.user).cast("int").as("user"),
      col(c.item).cast("int").as("item"),
      col(c.rating).cast("float").as("rating"))
    val als = new ALS()
      .setRank(rank)
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setSeed(Seed)
      .setUserCol("user")
      .setItemCol("item")
      .setRatingCol("rating")
      .setColdStartStrategy("drop")
    val model = als.fit(df)
    (model.userFactors.select(col("id").cast("long").as("id"), col("features")),
      model.itemFactors.select(col("id").cast("long").as("id"), col("features")))
  }
}
