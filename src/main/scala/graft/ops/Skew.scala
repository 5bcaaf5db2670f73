package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys — the manual complement to
  * AQE's runtime skew-join splitting, for when the skew is known up front
  * (a celebrity user, an empty-string key, a default id).
  *
  * Salted join: the skewed (large) side gets a random-but-deterministic salt
  * in [0, salt); the small side is replicated `salt` times; the join key
  * becomes (key, salt), spreading each hot key over `salt` reducers. Results
  * are identical to the unsalted join — replication × salting covers every
  * original pair exactly once.
  */
object Skew {

  /** Deterministic pseudo-salt from row content (xxhash64 of all columns) —
    * stable across retries/replays, uniform across partitions.
    */
  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt)).cast("int")

  /** Inner equi-join of a skewed large side with a small side on `keys`,
    * spread over `salt` sub-keys. The small side is replicated salt× (its
    * size must tolerate that — it is broadcast when under the threshold).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val salted = large.withColumn("__salt", saltCol(large, salt))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys: first
    * aggregate on (key, salt), then merge the partials per key. The caller
    * supplies mergeable partial aggregates (sum/count/min/max style).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int): DataFrame = {
    val partial = df.withColumn("__salt", saltCol(df, salt))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
