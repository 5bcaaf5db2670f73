package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming exact dedup with a PERSISTENT content-key state — the
  * streaming face of [[graft.ops.Dedup.exactByHash]]: the per-key
  * sufficient statistic (128-bit content digest → min id, count) is
  * MERGEABLE, so each micro-batch appends only its own partial aggregate
  * (one map-side-combinable aggregation over the batch; document text
  * never persists, never re-reads) and the corpus-wide representative set
  * derives from the merged state on demand.
  *
  * Durability: the [[BatchDirs]] contract — overwrite-idempotent
  * `b<batchId>/` dirs, LSM-folded by [[compact]]. Folding is a plain row
  * union and stays correct because [[representatives]] re-aggregates:
  * min-of-mins and sum-of-partial-sums are exactly the merge operators of
  * the statistic.
  */
object ExactDedupMaintainer {

  private def stateSchema: StructType = StructType(Seq(
    StructField("__h1", LongType),
    StructField("__h2", LongType),
    StructField("rep", LongType),
    StructField("n", LongType)))

  /** One micro-batch: partial (min id, count) per content key. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, stateDir: String): Unit =
    graft.Exec.stage(s"dedup_exact.processBatch b$batchId") {
      BatchDirs.stateParts(
        batch.select(col(idCol).cast("long").as("id"),
            xxhash64(col(textCol)).as("__h1"),
            xxhash64(length(col(textCol)), col(textCol)).as("__h2"))
          .groupBy("__h1", "__h2")
          .agg(min(col("id")).as("rep"), count(lit(1)).as("n")))
        .write.mode("overwrite").parquet(s"$stateDir/b$batchId")
    }

  /** The corpus-wide exact-dedup representatives as of the last committed
    * batch — identical to a one-shot [[graft.ops.Dedup.exactByHash]] over
    * everything ingested. Returns (doc_id, n_copies).
    */
  def representatives(spark: SparkSession, stateDir: String): DataFrame =
    repsWithKeys(spark, stateDir).select(col("doc_id"), col("n_copies"))

  /** [[representatives]] keyed by the content digest —
    * (__h1, __h2, doc_id, n_copies) — the relabeling frame incremental
    * curation joins window-indexed ids through (indexed id → digest →
    * CURRENT representative).
    */
  def repsWithKeys(spark: SparkSession, stateDir: String): DataFrame = {
    val maxC = BatchDirs.listDirs(stateDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(stateDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, stateSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, stateSchema))
      .groupBy("__h1", "__h2")
      .agg(min(col("rep")).as("doc_id"), sum(col("n")).as("n_copies"))
  }

  /** Content keys present in state from batches BEFORE `batchId` — the
    * replay-safe "is this digest new?" frame: re-running batch b must not
    * see b's own prior write, so b-dirs at or past `batchId` are excluded.
    * Requires the compaction horizon ≤ batchId − 1 (the [[BatchDirs]]
    * replay contract already keeps the newest batch out of folds).
    */
  def stateKeysBefore(spark: SparkSession, stateDir: String,
      batchId: Long): DataFrame = {
    val maxC = BatchDirs.listDirs(stateDir, "c").lastOption
    require(maxC.fold(-1L)(_._1) < batchId,
      s"compaction horizon ${maxC.fold(-1L)(_._1)} has folded batch " +
        s"$batchId — replay would see its own write")
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(stateDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) && id < batchId }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, stateSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, stateSchema))
      .select(col("__h1"), col("__h2")).distinct()
  }

  /** Fold committed batch dirs (default horizon: max batch − 1). */
  def compact(spark: SparkSession, stateDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, stateDir, stateSchema, None, upToOpt)

  /** Attach to a streaming document source. */
  def attach(docs: DataFrame, idCol: String, textCol: String,
      stateDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, stateDir)
        ()
      }
      .start()
}
