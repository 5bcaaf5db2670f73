package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.Multimodal

/** Streaming audio near-dup with a PERSISTENT fingerprint index — the
  * audio twin of [[ImageHashMaintainer]]: each micro-batch of raw WAV
  * payloads is DECODED AND FINGERPRINTED ONCE (quantized frame-energy
  * digit sequences, [[Multimodal.audioFingerprints]]), and the identical-
  * fingerprint pair set derives from the accumulated index — an equality
  * self-join on the fingerprint key, never a payload re-read.
  *
  * Durability: the [[BatchDirs]] contract — overwrite-idempotent
  * `b<batchId>/` dirs, LSM-folded by [[compact]] (pure row union; one row
  * per media id).
  */
object AudioFingerprintMaintainer {

  private def fpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("fp", StringType)))

  /** One micro-batch: decode + fingerprint, persist (media_id, fp). */
  def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
      frameLen: Int = 50, levels: Int = 8): Unit =
    BatchDirs.stateParts(
      Multimodal.audioFingerprints(batch, frameLen, levels)
        .select(col("media_id"), col("fp")))
      .write.mode("overwrite").parquet(s"$stateDir/b$batchId")

  /** The accumulated fingerprint index as of the last committed batch. */
  def readFingerprints(spark: SparkSession, stateDir: String): DataFrame = {
    val maxC = BatchDirs.listDirs(stateDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(stateDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, fpSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, fpSchema))
  }

  /** The corpus-wide identical-fingerprint pair set — identical to a
    * one-shot [[Multimodal.audioNearDupPairs]] over everything ingested.
    */
  def pairs(spark: SparkSession, stateDir: String): DataFrame = {
    val h = readFingerprints(spark, stateDir)
    h.select(col("media_id").as("id1"), col("fp"))
      .join(h.select(col("media_id").as("id2"), col("fp")), Seq("fp"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("fp"))
  }

  /** Fold committed batch dirs (default horizon: max batch − 1). */
  def compact(spark: SparkSession, stateDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, stateDir, fpSchema, None, upToOpt)

  /** Attach to a streaming media source: (media_id LONG, payload BINARY). */
  def attach(media: DataFrame, stateDir: String, checkpointDir: String,
      frameLen: Int = 50, levels: Int = 8): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir, frameLen, levels)
        ()
      }
      .start()
}
