package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.recdb.EventCols

/** Readers for the driver-generated testdata (TESTDATA.md) plus the derived
  * ratings triple the recommendation surface runs on.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The driver's generated `events.ts` has shipped as both TIMESTAMP(NANOS)
    * (read by Spark as LONG ns under nanosAsLong) and TIMESTAMP(MICROS)
    * (read as TimestampType). Downstream queries assume a LONG of epoch
    * nanoseconds, so widen a TimestampType ts to that representation; the
    * DuckDB oracle's `epoch_us(ts)` is precision-agnostic on its side.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        // every entry point pins spark.sql.session.timeZone=UTC, so the
        // NTZ→TZ cast is instant-preserving (wall time == UTC instant)
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
  }

  /** Per-(sf dir, process) key for gate-persisted artifacts under /tmp:
    * concurrent runs — even at the same scale factor — get disjoint
    * artifact dirs, and a run's oracle-path substitution (same JVM) always
    * matches what its gates wrote.
    */
  def runKey(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode) + "_" +
      ProcessHandle.current().pid()

  /** Register every table as a temp view so queries can go through spark.sql
    * (full Catalyst path) with the same table names the DuckDB oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => read(spark, dir, n).createOrReplaceTempView(n))

  /** The canonical events triple (README.md:76-80 `userid|itemid|ratingval`)
    * derived deterministically from the synthetic events table: identical
    * arithmetic in Spark and DuckDB (max() is order-independent and exact, so
    * no float drift enters the derivation).
    */
  def ratings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events")
      .groupBy(col("user_id").as("userid"), (col("event_id") % 100).as("itemid"))
      .agg(max(col("value")).as("rating"))

  val ratingCols: EventCols = EventCols("userid", "itemid", "rating")

  /** DuckDB-dialect CTE body for the same derivation — prefix for oracle SQL. */
  val ratingsSql: String =
    """ratings AS (
      |  SELECT user_id AS userid, event_id % 100 AS itemid, max(value) AS rating
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin
}
