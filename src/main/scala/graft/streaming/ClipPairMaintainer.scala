package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.Multimodal

/** Streaming CLIP-pair construction with persistent gated-doc state: each
  * micro-batch of raw documents is quality/langid-SCORED ONCE (the text
  * scan is the per-doc cost) and only the survivors persist as
  * (doc_id, quality, lang) rows; the pair table derives from the
  * accumulated state on demand ([[Multimodal.clipPairsFromKept]]).
  *
  * Pair assignment is retroactive by design: the md5-rank round-robin is
  * a pure function of the kept-doc SET, so a late-arriving document
  * reassigns earlier docs' images — deriving from state makes that free
  * (rank recomputation over the bounded gated state, never a re-scan of
  * document text).
  *
  * Durability: the [[BatchDirs]] contract — overwrite-idempotent
  * `b<batchId>/` dirs, LSM-folded by [[compact]] (pure row union; one row
  * per doc id).
  */
object ClipPairMaintainer {

  private def keptSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("quality", DoubleType),
    StructField("lang", StringType)))

  /** One micro-batch: gate + persist the scored survivors. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, minQuality: Double, keepLang: String,
      stateDir: String): Unit =
    BatchDirs.stateParts(
      Multimodal.gateDocs(batch, idCol, textCol, minQuality, keepLang))
      .write.mode("overwrite").parquet(s"$stateDir/b$batchId")

  /** The accumulated gated-doc state as of the last committed batch. */
  def readKept(spark: SparkSession, idCol: String,
      stateDir: String): DataFrame = {
    val schema = keptSchema(idCol)
    val maxC = BatchDirs.listDirs(stateDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(stateDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, schema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, schema))
  }

  /** The corpus-wide pair table — identical to a one-shot
    * [[Multimodal.clipPairs]] over everything ingested, derived purely
    * from the persisted gated state.
    */
  def pairs(spark: SparkSession, stateDir: String, media: DataFrame,
      idCol: String, dim: Int = 16, seed: Long = 42L): DataFrame =
    Multimodal.clipPairsFromKept(readKept(spark, idCol, stateDir), media,
      idCol, dim, seed)

  /** Fold committed batch dirs (default horizon: max batch − 1). */
  def compact(spark: SparkSession, idCol: String, stateDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, stateDir, keptSchema(idCol), None, upToOpt)

  /** Attach to a streaming document source: (idCol LONG, textCol STRING). */
  def attach(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, keepLang: String, stateDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, minQuality, keepLang,
          stateDir)
        ()
      }
      .start()
}
