package graft

import org.apache.spark.sql.functions._

/** The driver-generated events table has shipped `ts` as TIMESTAMP(NANOS)
  * (read as LONG under nanosAsLong), TIMESTAMP(MICROS) (TimestampType /
  * TIMESTAMP_NTZ depending on writer metadata) — and broke five event-time
  * gates when it switched. [[Tables.read]] absorbs the drift: every
  * representation normalizes to the same epoch-nanos LONG.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2026-01-01T00:00:01.234567Z and one hour later, as epoch micros
  private val us = Seq(1767225601234567L, 1767229201234567L)

  private def writeAndRead(dir: String)(write: String => Unit): Seq[Long] = {
    write(s"$dir/events.parquet")
    Tables.read(spark, dir, "events")
      .orderBy("event_id").collect().map(_.getAs[Long]("ts")).toSeq
  }

  test("events.ts normalizes to epoch-nanos LONG for long-ns, timestamp and timestamp_ntz parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val expected = us.map(_ * 1000L)

    val asLong = writeAndRead(s"$base/ns") { p =>
      us.zipWithIndex.map { case (u, i) => (i.toLong, u * 1000L) }
        .toDF("event_id", "ts").write.parquet(p)
    }
    asLong shouldBe expected

    val asTz = writeAndRead(s"$base/tz") { p =>
      us.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("event_id", "u")
        .select(col("event_id"), timestamp_micros(col("u")).as("ts"))
        .write.parquet(p)
    }
    asTz shouldBe expected

    val asNtz = writeAndRead(s"$base/ntz") { p =>
      us.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("event_id", "u")
        .select(col("event_id"),
          timestamp_micros(col("u")).cast("timestamp_ntz").as("ts"))
        .write.parquet(p)
    }
    asNtz shouldBe expected

    // non-events tables pass through untouched (no ts column contract)
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    docs.write.parquet(s"$base/plain/documents.parquet")
    Tables.read(spark, s"$base/plain", "documents").columns.toSeq shouldBe
      Seq("doc_id", "text")
  }
}
