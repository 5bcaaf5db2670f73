package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once by its join key so
  * every later equi-join/aggregation on that key is exchange-free — the
  * co-located-join strategy for repeated joins at 100 TB (each bucket pairs
  * up by file, no runtime shuffle, no driver coordination).
  *
  * Spark bucketing is metastore-backed, so these go through saveAsTable on
  * the session catalog; `numBuckets` should be sized so a bucket ≈ one
  * executor-core task (e.g. 100 TB / 2048 buckets ≈ 50 GB per bucket before
  * partition pruning).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** The concrete physical plan, unwrapped from the AQE shell —
    * AdaptiveSparkPlanExec exposes no children, so a naive
    * `executedPlan.collect` silently inspects nothing.
    */
  def concretePlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  /** True iff the physical plan of `df` contains no SHUFFLE exchange (a
    * broadcast exchange moves no fact-table data) — the assertion that
    * bucketing actually co-located the computation.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    concretePlan(df).collect {
      case s: ShuffleExchangeLike => s
    }.isEmpty
  }
}
