package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed Spark-first (builder
  * prompt: compose existing ops before custom plans).
  *
  * - [[asofJoin]]: for every left row, the latest right row with
  *   `right.on <= left.on` within the same `by` group — the time-series
  *   point-in-time lookup. NOT a join+filter+max (that fans out to
  *   |left|·|right per key| rows); instead both sides are unioned, sorted
  *   once per `by` group, and swept with a running `last(ignoreNulls)`
  *   window — one shuffle on `by`, linear scan, no fan-out. This is the
  *   merge-sweep formulation that survives 100 TB: cost is
  *   sort-within-partition of |L|+|R|, the same as any windowed aggregate.
  *
  * - [[rangeJoinBinned]]: point-in-interval join. The naive theta-join is a
  *   cartesian product; the scale path bins the number line with a fixed
  *   `binWidth`, explodes each interval to the bins it covers, equi-joins
  *   points to bins (ordinary shuffle join, AQE-managed), and refines with
  *   the exact predicate. Completeness: floor is monotone, so
  *   lo <= x <= hi implies floor(lo/w) <= floor(x/w) <= floor(hi/w).
  */
object Joins {

  /** As-of join (backward): left columns plus `valueCols` from the matching
    * right row (null when no right row precedes). Ties on `on` match
    * (right-at-equal-instant is visible to left). If several right rows
    * share (by, on), the one with the greatest `tieBreak` wins —
    * deterministic output for non-unique timestamps.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: String, by: String,
      valueCols: Seq[String], tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rw = Window.partitionBy(col(by), col(on))
      .orderBy(col(tieBreak).desc)
    val r1 = right.withColumn("__rn", row_number().over(rw))
      .where(col("__rn") === 1)
      .select(col(by), col(on),
        struct(valueCols.map(col): _*).as("__rpay"))
    val l1 = left.select(
      Seq(col(by), col(on), lit(1).as("__isl"),
        struct(leftCols.map(col): _*).as("__lpay"),
        lit(null).cast(r1.schema("__rpay").dataType).as("__rpay")): _*)
    val r2 = r1.select(col(by), col(on), lit(0).as("__isl"),
      lit(null).cast(l1.schema("__lpay").dataType).as("__lpay"), col("__rpay"))
    // right rows sort before left rows at the same `on` instant, so <= ties
    // are visible to the sweep
    val w = Window.partitionBy(col(by)).orderBy(col(on), col("__isl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l1.unionByName(r2)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__isl") === 1)
    val lOut = leftCols.map(c => col(s"__lpay.$c").as(c))
    val rOut = valueCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    swept.select(lOut ++ rOut: _*)
  }

  /** Binned range join: rows (left ++ right) where
    * `lo <= left(pointCol) <= hi`. `binWidth` should approximate the typical
    * interval width so each interval covers O(1) bins.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap variant: pairs where [aLo,aHi] ∩ [bLo,bHi] ≠ ∅,
    * binned the same way (both sides explode; candidates dedup on the pair
    * before the exact refine).
    */
  def intervalOverlapBinned(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("__bin"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      // an overlapping pair shares every bin between the later lo and the
      // earlier hi; emitting only in the later-lo bin dedups without a
      // distinct() shuffle
      .where(col("__bin") === greatest(floor(col(aLo) / binWidth).cast("long"),
        floor(col(bLo) / binWidth).cast("long")))
      .drop("__bin")
  }

  /** Convenience Column for callers composing their own exact refinement. */
  def between(point: Column, lo: Column, hi: Column): Column =
    point >= lo && point <= hi

  /** Bloom-filter-accelerated semi join: `big` rows whose `bigKey` appears in
    * `small`'s `smallKey` — an explicit, user-controllable rendition of the
    * runtime-filter pattern (cf. Spark's InjectRuntimeFilter, which does the
    * same thing automatically inside eligible shuffle joins).
    *
    * Plan shape: (1) ONE distributed aggregation over `small` builds a bloom
    * filter with Spark's native `BloomFilterAggregate` (codegen'd hashing,
    * map-side partial merge of bit vectors); (2) the serialized filter — a
    * bounded `numBits`-bit payload regardless of row count — ships back as a
    * literal into `BloomFilterMightContain`, a codegen'd predicate evaluated
    * AT THE SCAN of `big`, before any shuffle; (3) an exact semi join removes
    * the false positives. At 100 TB the win is step (2): the big side's
    * shuffle carries only the ~fpp false-positive overhang plus true matches
    * instead of every row.
    *
    * Output equals `big.join(small, bigKey === smallKey, "semi")` exactly —
    * the bloom can only admit extra candidates and the final semi join
    * removes them, so the operator is oracle-checkable against the plain
    * semi join.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 4000000L,
      fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnShim
    import org.apache.spark.util.sketch.BloomFilter
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnShim.expression(col(smallKey)), Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    val bytes = small.select(ColumnShim.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    val might = ColumnShim.column(BloomFilterMightContain(
      Literal.create(bytes,
        org.apache.spark.sql.types.BinaryType),
      ColumnShim.expression(col(bigKey))))
    big.where(might)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "semi")
  }
}
