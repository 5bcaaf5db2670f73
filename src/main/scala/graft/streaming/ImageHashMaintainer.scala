package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.Multimodal

/** Streaming image near-dup with a PERSISTENT dHash index — the first
  * streaming face of the multimodal surface: each micro-batch of raw
  * payloads is DECODED AND HASHED ONCE (the decode is the dominant cost of
  * image dedup, which is exactly what makes the index worth persisting;
  * 3 longs per image thereafter), and the banded near-dup pair set derives
  * from the accumulated hash index on demand
  * ([[Multimodal.imageNearDupPairsFromHashes]]) — a scan of the bounded
  * index, never of the payloads.
  *
  * Near-dup pairing is retroactive the same way substring duplication is:
  * a newly ingested image can pair with any earlier one. Deriving from
  * state makes that free — no payload is ever re-read.
  *
  * Durability: the [[BatchDirs]] contract — overwrite-idempotent
  * `b<batchId>/` dirs, LSM-folded by [[compact]] (pure row union; one row
  * per media id, so folding is trivially exact).
  */
object ImageHashMaintainer {

  private def hashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dhash_hi", LongType),
    StructField("dhash_lo", LongType)))

  /** One micro-batch: decode + hash, persist (media_id, 2×32-bit hash). */
  def processBatch(batch: DataFrame, batchId: Long,
      stateDir: String): Unit =
    BatchDirs.stateParts(Multimodal.dHashStats(batch)
        .select(col("media_id"), col("dhash_hi"), col("dhash_lo")))
      .write.mode("overwrite").parquet(s"$stateDir/b$batchId")

  /** The accumulated hash index as of the last committed batch. */
  def readHashes(spark: SparkSession, stateDir: String): DataFrame = {
    val maxC = BatchDirs.listDirs(stateDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(stateDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, hashSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, hashSchema))
  }

  /** The corpus-wide banded near-dup pair set — identical to a one-shot
    * [[Multimodal.imageNearDupPairs]] over everything ingested, derived
    * purely from the persisted hashes.
    */
  def pairs(spark: SparkSession, stateDir: String,
      maxHamming: Int = 3): DataFrame =
    Multimodal.imageNearDupPairsFromHashes(
      readHashes(spark, stateDir), maxHamming)

  /** Fold committed batch dirs (default horizon: max batch − 1). */
  def compact(spark: SparkSession, stateDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, stateDir, hashSchema, None, upToOpt)

  /** Attach to a streaming media source: (media_id LONG, payload BINARY). */
  def attach(media: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir)
        ()
      }
      .start()
}
