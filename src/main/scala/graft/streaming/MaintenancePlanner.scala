package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Autonomous-maintenance planning over the persistent streaming states —
  * the scheduling face of the reference's threshold-maintenance idea
  * (recathon.c:1089 rebuilds a recommender when inserts cross 0.5× the
  * build-time total) generalized across every maintained artifact this
  * engine keeps: ONE metadata-cost sweep reads each state's health signal
  * and emits the (state, metric, value, threshold, decision) table an
  * operations loop executes from, instead of each artifact hiding its own
  * ad-hoc trigger.
  *
  * Every metric is sidecar- or metadata-sized by construction — the
  * planner NEVER re-scans a corpus, which is what makes a fleet-wide
  * sweep viable at 100 TB where the states themselves are huge:
  *
  *   - `dead_fraction` ([[ShardMaintainer.deadFraction]]): seq-id-sized
  *     joins over append/tombstone sidecars → `compact` (the
  *     [[ShardMaintainer.compactTombstones]] rewrite pays off once the
  *     dead mass warrants it).
  *   - `drift_ratio` ([[AnnIndexMaintainer.driftRatio]]): two sums over
  *     the per-batch distortion sidecar → `retrain` (the frozen-quantizer
  *     policy's offline [[AnnIndexMaintainer.retrain]] remedy).
  *   - `delta_fraction` ([[deltaFraction]]): parquet-footer row counts of
  *     un-folded batch dirs over the total → `compact` (fold the LSM
  *     delta once read fan-in/delta mass crosses the line).
  *   - `kl_drift` ([[graft.ops.Corpus.klTotal]] between the selection
  *     baseline's word-frequency snapshot and the current one):
  *     vocabulary-sized aggregate → `recurate` (the
  *     [[CurateMaintainer.processBatchDriftTriggered]] re-derivation,
  *     surfaced as a decision for a trigger running out-of-band).
  *
  * Decisions are threshold comparisons on the driver — the table is
  * bounded by the number of states, not data. Callers act on the
  * decisions with the respective maintainers' own operations; the planner
  * only measures and recommends (idempotent, safe to run on a schedule).
  */
object MaintenancePlanner {

  sealed trait StateSpec { def name: String; def threshold: Double }

  /** Training-shard layout ([[ShardMaintainer]]): tombstoned mass →
    * `compact`. */
  final case class ShardSpec(name: String, dir: String,
      threshold: Double) extends StateSpec

  /** Monitored ANN inverted file
    * ([[AnnIndexMaintainer.processBatchMonitored]]): quantization
    * distortion drift → `retrain`. */
  final case class AnnSpec(name: String, dir: String,
      threshold: Double) extends StateSpec

  /** Any `c*`/`b*` LSM state ([[BatchDirs]] layout: postings index,
    * inverted file, signature index): un-folded delta mass → `compact`. */
  final case class DeltaSpec(name: String, dir: String,
      threshold: Double) extends StateSpec

  /** Drift-triggered curation state ([[CurateMaintainer]]): token
    * distribution movement since the selection baseline → `recurate`. */
  final case class CurateSpec(name: String, dir: String,
      threshold: Double) extends StateSpec

  /** Fraction of state rows living in batch dirs NEWER than the last
    * compaction horizon — the LSM compaction trigger. Row counts come
    * from parquet footers (a metadata read), never a data scan.
    */
  def deltaFraction(spark: SparkSession, dir: String): Double = {
    val maxC = BatchDirs.listDirs(dir, "c").lastOption
    val live = BatchDirs.listDirs(dir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }.map(_._2)
    val nDelta = live.map(p => spark.read.parquet(p).count()).sum
    val nBase = maxC.map(c => spark.read.parquet(c._2).count()).getOrElse(0L)
    val tot = nBase + nDelta
    if (tot == 0L) 0.0 else nDelta.toDouble / tot
  }

  /** Token-distribution movement since the last selection re-derivation:
    * KL(current ‖ baseline snapshot) from the maintained word-frequency
    * state — exactly the statistic
    * [[CurateMaintainer.processBatchDriftTriggered]] triggers on, exposed
    * so an out-of-band planner can flag a stale selection (e.g. when the
    * inline trigger is disabled or mis-tuned). 0 when the state has no
    * baseline or no batches yet.
    */
  def curateKlDrift(spark: SparkSession, stateDir: String): Double = {
    val base = CurateMaintainer.selectionBaseline(stateDir)
    val cur = BatchDirs.listDirs(s"$stateDir/freq", "b")
      .lastOption.map(_._1).getOrElse(-1L)
    if (base < 0L || cur < 0L || cur == base) 0.0
    else graft.ops.Corpus.klTotal(
      BpeMaintainer.stateWordFreq(spark, s"$stateDir/freq", base),
      BpeMaintainer.stateWordFreq(spark, s"$stateDir/freq", cur))
  }

  /** The decision sweep: one row per state, value measured by the
    * state-kind's reader above, decision = threshold comparison. Output
    * is a bounded driver-built frame (states, not data, set its size).
    */
  def plan(spark: SparkSession, specs: Seq[StateSpec]): DataFrame = {
    import spark.implicits._
    val rows = specs.map {
      case ShardSpec(n, dir, t) =>
        val v = ShardMaintainer.deadFraction(spark, dir)
        (n, "dead_fraction", v, t, if (v >= t) "compact" else "none")
      case AnnSpec(n, dir, t) =>
        val v = AnnIndexMaintainer.driftRatio(spark, dir).getOrElse(0.0)
        (n, "drift_ratio", v, t, if (v >= t) "retrain" else "none")
      case DeltaSpec(n, dir, t) =>
        val v = deltaFraction(spark, dir)
        (n, "delta_fraction", v, t, if (v >= t) "compact" else "none")
      case CurateSpec(n, dir, t) =>
        val v = curateKlDrift(spark, dir)
        (n, "kl_drift", v, t, if (v >= t) "recurate" else "none")
    }
    rows.toDF("state", "metric", "value", "threshold", "decision")
  }
}
