package graft.recdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental cosine-model maintenance — beyond the reference, which only
  * ever FULLY rebuilds at the update threshold (recathon.c:1089-1170). At
  * 100 TB a full rebuild recomputes every co-rating pair; this keeps the
  * model's sufficient statistics as MERGEABLE state so a delta batch costs
  * work proportional to the DELTA USERS' activity, not the corpus:
  *
  *   state = (dots: (p1, p2, dot) triangular, norms2: (p, n2))
  *   cosine(p1, p2) = dot / sqrt(n2_1 · n2_2)
  *
  * A batch of NEW events D against history E adds
  *   - within-D co-rating products (D ⋈ D on the join key, triangular), and
  *   - cross D×E products (D ⋈ E on the join key) — E is semi-filtered to
  *     the delta's join keys by the join itself, so untouched users/items
  *     never participate;
  * both merge into state by an outer-join sum. Contract: delta rows are NEW
  * (joinKey, pairKey) observations (append-only events, the same contract
  * the reference's INSERT hook assumes); re-rating an existing cell needs a
  * retract/re-add, which mergeable sums support but this helper does not
  * automate.
  *
  * Scale notes: the state merge shuffles on the pair key — bucket the
  * persisted state by p1 so each merge co-partitions instead of reshuffling
  * (graft.sources.Bucketing). The final model projection is a map-side
  * divide over the merged state.
  */
object IncrementalSimilarity {

  final case class SimState(dots: DataFrame, norms2: DataFrame)

  /** Initial state from an events snapshot (item-based: pairs are items,
    * co-rating key is the user).
    */
  def itemCosineState(events: DataFrame, c: EventCols = EventCols()): SimState =
    buildState(events, c.user, c.item, c.rating)

  /** User-based variant (transpose). */
  def userCosineState(events: DataFrame, c: EventCols = EventCols()): SimState =
    buildState(events, c.item, c.user, c.rating)

  /** Merge a delta of NEW events into state. `history` is the events table
    * BEFORE the delta (the maintainer's events store).
    */
  def updateItemCosineState(state: SimState, history: DataFrame,
      delta: DataFrame, c: EventCols = EventCols()): SimState =
    mergeState(state, history, delta, c.user, c.item, c.rating)

  def updateUserCosineState(state: SimState, history: DataFrame,
      delta: DataFrame, c: EventCols = EventCols()): SimState =
    mergeState(state, history, delta, c.item, c.user, c.rating)

  /** The model the full build would produce: similarity > 0, triangular. */
  def cosineFromState(state: SimState, out1: String, out2: String): DataFrame =
    state.dots
      .join(state.norms2.select(col("p").as("p1"), col("n2").as("n21")), "p1")
      .join(state.norms2.select(col("p").as("p2"), col("n2").as("n22")), "p2")
      .select(col("p1").as(out1), col("p2").as(out2),
        (col("dot") / sqrt(col("n21") * col("n22"))).as("similarity"))
      .where(col("similarity") > 0d)

  private def prep(df: DataFrame, joinKey: String, pairKey: String,
      rating: String): DataFrame =
    df.select(col(joinKey).as("k"), col(pairKey).as("p"),
      col(rating).cast("double").as("r"))

  private def buildState(events: DataFrame, joinKey: String, pairKey: String,
      rating: String): SimState = {
    val e = prep(events, joinKey, pairKey, rating)
    val dots = e.select(col("k"), col("p").as("p1"), col("r").as("r1"))
      .join(e.select(col("k"), col("p").as("p2"), col("r").as("r2")), Seq("k"))
      .where(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(sum(col("r1") * col("r2")).as("dot"))
    val norms2 = e.groupBy(col("p")).agg(sum(col("r") * col("r")).as("n2"))
    SimState(dots, norms2)
  }

  private def mergeState(state: SimState, history: DataFrame, delta: DataFrame,
      joinKey: String, pairKey: String, rating: String): SimState = {
    val d = prep(delta, joinKey, pairKey, rating)
    val h = prep(history, joinKey, pairKey, rating)
    // within-delta pairs (triangular)
    val dd = d.select(col("k"), col("p").as("p1"), col("r").as("r1"))
      .join(d.select(col("k"), col("p").as("p2"), col("r").as("r2")), Seq("k"))
      .where(col("p1") < col("p2"))
      .select(col("p1"), col("p2"), (col("r1") * col("r2")).as("x"))
    // delta × history pairs, normalized into the triangular convention;
    // the equi-join on k touches only the delta's co-rating keys
    val dh = d.select(col("k"), col("p").as("pd"), col("r").as("rd"))
      .join(h.select(col("k"), col("p").as("ph"), col("r").as("rh")), Seq("k"))
      .where(col("pd") =!= col("ph"))
      .select(least(col("pd"), col("ph")).as("p1"),
        greatest(col("pd"), col("ph")).as("p2"),
        (col("rd") * col("rh")).as("x"))
    val deltaDots = dd.unionAll(dh).groupBy("p1", "p2").agg(sum(col("x")).as("ddot"))
    val dots = state.dots.join(deltaDots, Seq("p1", "p2"), "full")
      .select(col("p1"), col("p2"),
        (coalesce(col("dot"), lit(0.0)) + coalesce(col("ddot"), lit(0.0))).as("dot"))
    val deltaNorms = d.groupBy(col("p")).agg(sum(col("r") * col("r")).as("dn2"))
    val norms2 = state.norms2.join(deltaNorms, Seq("p"), "full")
      .select(col("p"),
        (coalesce(col("n2"), lit(0.0)) + coalesce(col("dn2"), lit(0.0))).as("n2"))
    SimState(dots, norms2)
  }
}
