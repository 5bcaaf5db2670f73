package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CROSS-STATE consistent snapshots — the training-run version object.
  * Each maintained state time-travels on its own `batch_id` axis
  * (shards, curation selection, postings, ANN inverted file); what a
  * reproducibility audit actually needs is all four PINNED TOGETHER:
  * "version 7 of the training run" = the tuple of horizons whose as-of
  * reads compose to the exact historical training input. A manifest is
  * a tiny parquet of (state, kind, dir, as_of, id_col) rows committed by
  * a single rename — the same artifact discipline as every sidecar —
  * and [[readState]] dispatches each row to its state's own as-of
  * reader.
  *
  * [[pin]] VALIDATES resolvability at pin time (a shard horizon below
  * the sealed compaction floor, a selection horizon before the first
  * firing, a missing state dir — each fails the pin with the
  * maintainer's own error), so a manifest that exists is a manifest
  * that serves. [[verify]] re-checks the same conditions later — the
  * operational audit that catches a compaction that has since sealed
  * history out from under a pinned run (the seal contract says compact
  * only below your oldest pinned version; verify is how an operator
  * proves that held).
  *
  * Kinds: `shards` ([[ShardMaintainer.readShardsAsOf]]), `curate`
  * ([[CurateMaintainer.selectionAsOf]]), `postings`
  * ([[SearchIndexMaintainer.readPostings]] sliced on the row stamp),
  * `ann` ([[AnnIndexMaintainer.readIndex]] sliced on the row stamp).
  */
object SnapshotManifest {

  final case class Pin(state: String, kind: String, dir: String,
      asOf: Long, idCol: String = "")

  private val manifestSchema: StructType = StructType(Seq(
    StructField("state", StringType),
    StructField("kind", StringType),
    StructField("dir", StringType),
    StructField("as_of", LongType),
    StructField("id_col", StringType)))

  private val kinds = Set("shards", "curate", "postings", "ann")

  /** Write the manifest (temp-write + rename, crash-atomic) after
    * validating every pin RESOLVES — failing at pin time, not at some
    * later read. Duplicate state names are rejected.
    */
  def pin(spark: SparkSession, pins: Seq[Pin], manifestDir: String): Unit = {
    require(pins.nonEmpty, "pin: empty manifest")
    require(pins.map(_.state).distinct.size == pins.size,
      s"pin: duplicate state names in ${pins.map(_.state)}")
    pins.foreach { p =>
      require(kinds.contains(p.kind),
        s"pin: unknown state kind '${p.kind}' (expected one of $kinds)")
      resolve(spark, p).count() // any unresolvable horizon throws here
      ()
    }
    import spark.implicits._
    val tmp = manifestDir + ".__tmp"
    graft.Exec.deletePath(tmp)
    pins.map(p => (p.state, p.kind, p.dir, p.asOf, p.idCol))
      .toDF("state", "kind", "dir", "as_of", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    graft.Exec.deletePath(manifestDir)
    require(new java.io.File(tmp).renameTo(new java.io.File(manifestDir)),
      s"manifest commit failed: $manifestDir")
  }

  def pins(spark: SparkSession, manifestDir: String): Seq[Pin] =
    spark.read.schema(manifestSchema).parquet(manifestDir).collect()
      .map(r => Pin(r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
      .sortBy(_.state).toSeq

  /** The pinned historical view of one state, re-read from CURRENT
    * files through the state's own as-of reader. */
  def readState(spark: SparkSession, manifestDir: String,
      state: String): DataFrame = {
    val p = pins(spark, manifestDir).find(_.state == state).getOrElse(
      throw new IllegalArgumentException(
        s"manifest $manifestDir has no state '$state'"))
    resolve(spark, p)
  }

  /** Re-check that every pinned horizon still resolves (e.g. after later
    * compactions): one row per pin — (state, kind, as_of, ok, reason).
    */
  def verify(spark: SparkSession, manifestDir: String): DataFrame = {
    import spark.implicits._
    pins(spark, manifestDir).map { p =>
      val err =
        try { resolve(spark, p).count(); "" }
        catch { case e: Exception => Option(e.getMessage).getOrElse("error") }
      (p.state, p.kind, p.asOf, err.isEmpty, err)
    }.toDF("state", "kind", "as_of", "ok", "reason")
  }

  private def resolve(spark: SparkSession, p: Pin): DataFrame = p.kind match {
    case "shards" => ShardMaintainer.readShardsAsOf(spark, p.dir, p.asOf)
    case "curate" => CurateMaintainer.selectionAsOf(spark, p.dir, p.asOf)
    case "postings" =>
      val idCol = if (p.idCol.nonEmpty) p.idCol else "doc_id"
      val df = SearchIndexMaintainer.readPostings(spark, idCol, p.dir)
        .where(col("batch_id") <= p.asOf)
      require(new java.io.File(p.dir).exists(),
        s"postings state dir ${p.dir} does not exist")
      df.drop("batch_id")
    case "ann" =>
      require(new java.io.File(p.dir).exists(),
        s"ann index dir ${p.dir} does not exist")
      AnnIndexMaintainer.readIndex(spark, p.dir)
        .where(col("batch_id") <= p.asOf).drop("batch_id")
    case other => throw new IllegalArgumentException(
      s"unknown state kind '$other'")
  }
}
