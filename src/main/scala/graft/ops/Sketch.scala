package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-accelerated exact operators.
  *
  * The pattern mirrors [[Joins.bloomSemiJoin]]: a one-sided-error sketch
  * screens the corpus map-side, then an EXACT computation runs over the
  * (structurally small) survivor set — so the result is bit-identical to the
  * naive plan while the shuffle carries candidates instead of the universe.
  *
  * Heavy hitters over a 100 TB token stream is the motivating case: a plain
  * `groupBy(token).count().where(cnt >= T)` shuffles every DISTINCT token at
  * least once (map-side combine bounds rows per partition, not the key
  * universe — a web-scale corpus has billions of distinct tokens in its Zipf
  * tail). The count-min sketch is a fixed ~1 MB summary (merged once,
  * broadcast back), and a key's estimate only ever OVER-counts, so filtering
  * on `estimate >= T` can drop no true heavy hitter; the exact re-count then
  * removes the sketch's false positives. The tail — the overwhelming mass of
  * keys — never reaches an exchange.
  */
object Sketch {

  /** Exact keys-with-count ≥ minCount, sketch-screened.
    *
    * @param eps        CMS relative error (width = ceil(2/eps)); the default
    *                   1e-4 bounds over-count by ~2e-4·|rows| with ~1 MB of
    *                   sketch — tighten for corpora where minCount is a tiny
    *                   fraction of total rows, or the false-positive set
    *                   (which IS shuffled) grows.
    * @param confidence probability the eps bound holds per key (depth).
    */
  def heavyHitters(df: DataFrame, key: String, minCount: Long,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val keyed = df.select(col(key).cast("string").as("__k"))
      .where(col("__k").isNotNull) // CMS cannot sketch null keys
    val cms = keyed.stat.countMinSketch("__k", eps, confidence, seed)
    val bc = df.sparkSession.sparkContext.broadcast(cms)
    // null keys pass the screen unconditionally so the exact re-count
    // decides them — keeps the bit-identical-to-GROUP-BY/HAVING contract
    // for null-bearing key columns (a null group is one key; letting it
    // through costs one shuffled key, never correctness). The probe itself
    // is a codegen'd expression over the broadcast sketch — the screen is
    // the one stage that sees every row, so it must stay inside
    // whole-stage codegen, not a per-row lambda.
    val ks = col(key).cast("string")
    df.where(ks.isNull ||
        graft.functions.SketchFns.cmsEstimateNative(ks, bc) >= minCount)
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** Heavy hitters over an exploded expression (e.g. tokens of a text
    * column): `heavyHitters` after a generate, as one call.
    */
  def heavyValues(df: DataFrame, values: Column, outCol: String,
      minCount: Long, eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    heavyHitters(df.select(explode(values).as(outCol)), outCol, minCount,
      eps, confidence, seed)
}
