package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.TfIdf

/** Streaming BM25 search index: each micro-batch of documents is tokenized
  * ONCE into persisted postings rows (doc, term, tf) — the inverted-index
  * state — and queries derive [[TfIdf.bm25FromPostings]] from the
  * accumulated state. Corpus statistics (N, avgdl, df) come from the
  * postings alone, so ranking is retroactively consistent: a new batch
  * shifts every document's idf and length normalization exactly as a
  * one-shot rebuild would.
  *
  * Durability: the [[BatchDirs]] contract — overwrite-idempotent
  * `b<batchId>/` dirs, LSM-folded by [[compact]] (pure row union; a doc's
  * postings land wholly in its ingest batch, so folding is exact).
  */
object SearchIndexMaintainer {

  private def postSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("term", StringType),
    StructField("tf", LongType)))

  /** One micro-batch: tokenize + persist the postings. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, stateDir: String): Unit =
    TfIdf.postings(batch, idCol, textCol)
      .write.mode("overwrite").parquet(s"$stateDir/b$batchId")

  /** The accumulated postings as of the last committed batch. */
  def readPostings(spark: SparkSession, idCol: String,
      stateDir: String): DataFrame = {
    val schema = postSchema(idCol)
    val maxC = BatchDirs.listDirs(stateDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(stateDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, schema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, schema))
  }

  /** BM25 top-k over everything ingested — identical to a one-shot
    * [[TfIdf.bm25Search]] over the full corpus, derived purely from the
    * persisted postings.
    */
  def search(spark: SparkSession, stateDir: String, idCol: String,
      query: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame =
    TfIdf.bm25FromPostings(readPostings(spark, idCol, stateDir), idCol,
      query, k, k1, b, roundTo)

  /** Fold committed batch dirs (default horizon: max batch − 1). */
  def compact(spark: SparkSession, idCol: String, stateDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, stateDir, postSchema(idCol), None, upToOpt)

  /** Attach to a streaming document source: (idCol LONG, textCol STRING). */
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
