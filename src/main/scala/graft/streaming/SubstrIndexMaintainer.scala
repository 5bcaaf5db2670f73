package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.Dedup

/** Streaming exact-substring dedup with a PERSISTENT window-digest index —
  * the streaming face of [[Dedup.duplicateSpans]]. Each micro-batch of
  * documents is scanned and window-hashed ONCE ([[Dedup.windowDigests]]):
  * the batch's (id, pos, digest) rows land in an overwrite-idempotent
  * `b<batchId>/` dir and never need the text again. The duplicated-span
  * set is DERIVED from the index on demand ([[spans]]): merged counts ≥ 2
  * → island merge — a scan of the bounded index, not of the corpus.
  *
  * Exact-substring duplication is inherently RETROACTIVE: a newly ingested
  * document can make a window in an old document duplicated for the first
  * time, so the span set of old docs legitimately grows as batches arrive.
  * Persisting positions (not just counts) is what makes that cheap — the
  * affected old spans re-derive from index rows; no document is ever
  * re-read or re-hashed.
  *
  * Durability: same contract as [[NearDupMaintainer]] — per-batch
  * overwrite-idempotent dirs, LSM-folded by [[compact]] (pure row union;
  * counts are derived at read so folding can never double-count a key
  * whose rows span the fold boundary).
  */
object SubstrIndexMaintainer {

  private def indexSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("pos", IntegerType),
    StructField("__k", StringType)))

  /** One micro-batch: window-hash the batch docs, persist the digests.
    * Exposed for direct (non-streaming) batch ingestion too.
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, width: Int, indexDir: String): Unit = {
    val delta = batch.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    Dedup.windowDigests(delta, "id", "text", width)
      .select(col("id"), col("pos").cast("int").as("pos"), col("__k"))
      .write.mode("overwrite").parquet(s"$indexDir/b$batchId")
  }

  /** All committed index rows: the highest compacted dir plus the batch
    * dirs above its horizon.
    */
  private def indexRows(spark: SparkSession, indexDir: String): DataFrame = {
    val maxC = BatchDirs.listDirs(indexDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(indexDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, indexSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, indexSchema))
  }

  /** The corpus-wide duplicated-span set as of the last committed batch —
    * identical to a one-shot [[Dedup.duplicateSpans]] over everything
    * ingested (StreamingSpec asserts the equality), derived purely from
    * the persisted index.
    */
  def spans(spark: SparkSession, indexDir: String, width: Int): DataFrame =
    Dedup.dupSpansFromWindows(indexRows(spark, indexDir), "id", width)
      .withColumnRenamed("id", "doc_id")

  /** Fold committed batch dirs into one consolidated `c<upTo>/` dir
    * (default upTo: max batch − 1, keeping the newest batch replayable).
    */
  def compact(spark: SparkSession, indexDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, indexDir, indexSchema, None, upToOpt)

  /** Attach to a streaming document source: (idCol LONG-castable,
    * textCol STRING).
    */
  def attach(docs: DataFrame, idCol: String, textCol: String, width: Int,
      indexDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, width, indexDir)
        ()
      }
      .start()
}
