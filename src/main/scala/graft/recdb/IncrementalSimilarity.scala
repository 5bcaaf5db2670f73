package graft.recdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental similarity-model maintenance (cosine AND Pearson) — beyond
  * the reference, which only
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

  // ---- Pearson (mergeable sufficient statistics) ----------------------
  //
  // The Pearson model (recathon.c:1768-1962 semantics, see Similarity.pearson)
  // needs per-entity mean/center-norm over ALL the entity's events and the
  // centered dot over co-rated keys. Both reduce to sums that merge across
  // append-only delta batches:
  //   entity:  (n, s1 = Σr, s2 = Σr²)         → mean = s1/n, P² = s2 − s1²/n
  //   pair:    (nco, sab = Σab, sa = Σa, sb = Σb) over co-rated keys
  //   centered dot = sab − mean2·sa − mean1·sb + nco·mean1·mean2
  // so a delta re-touches only pairs sharing a co-rating key with the delta,
  // while every entity's MEAN can shift — the projection reads the merged
  // entity stats, making the mean shift free (no pair state rewrite).

  final case class PearsonState(pairs: DataFrame, entity: DataFrame)

  /** Initial Pearson state from an events snapshot (item-based). */
  def itemPearsonState(events: DataFrame, c: EventCols = EventCols()): PearsonState =
    buildPearsonState(events, c.user, c.item, c.rating)

  /** User-based variant (transpose). */
  def userPearsonState(events: DataFrame, c: EventCols = EventCols()): PearsonState =
    buildPearsonState(events, c.item, c.user, c.rating)

  def updateItemPearsonState(state: PearsonState, history: DataFrame,
      delta: DataFrame, c: EventCols = EventCols()): PearsonState =
    mergePearsonState(state, history, delta, c.user, c.item, c.rating)

  def updateUserPearsonState(state: PearsonState, history: DataFrame,
      delta: DataFrame, c: EventCols = EventCols()): PearsonState =
    mergePearsonState(state, history, delta, c.item, c.user, c.rating)

  /** The model the full Pearson build would produce: centered dot over
    * co-rating keys / (P1·P2), degenerate norms → NULL, sims == 0 dropped,
    * triangular (recathon.c:1885 keeps negatives).
    */
  def pearsonFromState(state: PearsonState, out1: String, out2: String): DataFrame = {
    val e = state.entity.select(col("p"), (col("s1") / col("n")).as("mean"),
      (col("s2") - col("s1") * col("s1") / col("n")).as("pp2"))
    state.pairs
      .join(e.select(col("p").as("p1"), col("mean").as("m1"), col("pp2").as("q1")), "p1")
      .join(e.select(col("p").as("p2"), col("mean").as("m2"), col("pp2").as("q2")), "p2")
      .select(col("p1").as(out1), col("p2").as(out2),
        when(col("q1") * col("q2") <= 0d, lit(null)).otherwise(
          (col("sab") - col("m2") * col("sa") - col("m1") * col("sb") +
            col("nco") * col("m1") * col("m2")) /
            sqrt(col("q1") * col("q2"))).as("similarity"))
      .where(col("similarity") =!= 0d)
  }

  private def buildPearsonState(events: DataFrame, joinKey: String,
      pairKey: String, rating: String): PearsonState = {
    val e = prep(events, joinKey, pairKey, rating)
    val pairs = e.select(col("k"), col("p").as("p1"), col("r").as("r1"))
      .join(e.select(col("k"), col("p").as("p2"), col("r").as("r2")), Seq("k"))
      .where(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("nco"), sum(col("r1") * col("r2")).as("sab"),
        sum(col("r1")).as("sa"), sum(col("r2")).as("sb"))
    val entity = e.groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("s1"),
        sum(col("r") * col("r")).as("s2"))
    PearsonState(pairs, entity)
  }

  private def mergePearsonState(state: PearsonState, history: DataFrame,
      delta: DataFrame, joinKey: String, pairKey: String,
      rating: String): PearsonState = {
    val d = prep(delta, joinKey, pairKey, rating)
    val h = prep(history, joinKey, pairKey, rating)
    val dd = d.select(col("k"), col("p").as("p1"), col("r").as("r1"))
      .join(d.select(col("k"), col("p").as("p2"), col("r").as("r2")), Seq("k"))
      .where(col("p1") < col("p2"))
      .select(col("p1"), col("p2"), (col("r1") * col("r2")).as("ab"),
        col("r1").as("a"), col("r2").as("b"))
    // delta × history normalized into the triangular convention: the delta
    // side's rating must land in the SLOT (a for p1, b for p2) its entity
    // occupies after least/greatest ordering
    val dh = d.select(col("k"), col("p").as("pd"), col("r").as("rd"))
      .join(h.select(col("k"), col("p").as("ph"), col("r").as("rh")), Seq("k"))
      .where(col("pd") =!= col("ph"))
      .select(least(col("pd"), col("ph")).as("p1"),
        greatest(col("pd"), col("ph")).as("p2"),
        (col("rd") * col("rh")).as("ab"),
        when(col("pd") < col("ph"), col("rd")).otherwise(col("rh")).as("a"),
        when(col("pd") < col("ph"), col("rh")).otherwise(col("rd")).as("b"))
    val deltaPairs = dd.unionAll(dh).groupBy("p1", "p2")
      .agg(count(lit(1)).as("dnco"), sum(col("ab")).as("dsab"),
        sum(col("a")).as("dsa"), sum(col("b")).as("dsb"))
    val pairs = state.pairs.join(deltaPairs, Seq("p1", "p2"), "full")
      .select(col("p1"), col("p2"),
        (coalesce(col("nco"), lit(0L)) + coalesce(col("dnco"), lit(0L))).as("nco"),
        (coalesce(col("sab"), lit(0.0)) + coalesce(col("dsab"), lit(0.0))).as("sab"),
        (coalesce(col("sa"), lit(0.0)) + coalesce(col("dsa"), lit(0.0))).as("sa"),
        (coalesce(col("sb"), lit(0.0)) + coalesce(col("dsb"), lit(0.0))).as("sb"))
    val deltaEntity = d.groupBy(col("p"))
      .agg(count(lit(1)).as("dn"), sum(col("r")).as("ds1"),
        sum(col("r") * col("r")).as("ds2"))
    val entity = state.entity.join(deltaEntity, Seq("p"), "full")
      .select(col("p"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s1"), lit(0.0)) + coalesce(col("ds1"), lit(0.0))).as("s1"),
        (coalesce(col("s2"), lit(0.0)) + coalesce(col("ds2"), lit(0.0))).as("s2"))
    PearsonState(pairs, entity)
  }

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
