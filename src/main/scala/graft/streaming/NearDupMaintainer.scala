package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.TextFns
import graft.ops.Dedup

/** Streaming near-duplicate detection with a PERSISTENT signature index —
  * the streaming face of [[graft.ops.Dedup.incrementalLshPairs]] (and the
  * dedup analog of the R17 maintenance hook, recathon.c:951-1203): each
  * micro-batch of documents is shingled and MinHash-signed ONCE, probed
  * against the on-disk index of everything ingested before it, the batch's
  * delta-touching near-dup pairs land in `pairsDir`, and the batch's own
  * signatures join the index — so the corpus is never re-signed and
  * per-batch cost tracks the batch, not the corpus.
  *
  * Index rows carry (id, sig, text, batch_id): signatures drive candidate
  * probing, and the text column exists solely so the exact-verify stage
  * can fetch the (structurally few) candidate corpus docs by semi-join —
  * columnar parquet reads only the matching rows' text. At warehouse scale
  * the text column would be a pointer into the document store instead;
  * nothing else changes. `batch_id` is the version axis: each doc is
  * signed once, ever, stamped with its ingest batch, so [[probeAsOf]]
  * reproduces any historical screening decision from the CURRENT files —
  * exact through compaction because the index is append-only (the same
  * discipline as [[AnnIndexMaintainer.searchAsOf]] /
  * [[SearchIndexMaintainer.searchAsOf]]).
  *
  * Durability layout (local-FS rendering, same contract as
  * [[graft.recdb.DeltaSimilarityMaintainer]] — a transactional table format
  * replaces it on a real cluster): both the index and the pairs output are
  * written as one overwrite-idempotent `b<batchId>/` dir per batch, and a
  * batch only ever READS index dirs with id strictly below its own — so a
  * crash-replay rewrites its two dirs byte-identically and can neither
  * double-append nor observe its own partial output.
  */
object NearDupMaintainer {

  final case class Config(nGram: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L)

  private def indexSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("text", StringType),
    StructField("batch_id", LongType)))

  /** Index contents from batches strictly BEFORE `batchId`: the highest
    * compacted dir (covering all batches ≤ its id) plus the batch dirs
    * between it and `batchId` (empty frame with the index schema when none
    * exist — the first-batch bootstrap). A compaction horizon at or above
    * `batchId` would hand the batch its own rows back (self-pairs on
    * replay), so it is rejected — [[compact]]'s default keeps the newest
    * batch out of the fold exactly for this.
    */
  def priorIndex(spark: SparkSession, indexDir: String,
      batchId: Long): DataFrame = {
    val maxC = BatchDirs.listDirs(indexDir, "c").lastOption
    maxC.foreach { case (k, _) =>
      require(k < batchId,
        s"replaying batch $batchId at or below compaction horizon $k — " +
          "compact only durably-committed batches")
    }
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(indexDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) && id < batchId }
      .map(_._2)
    BatchDirs.readUnion(spark, dirs, indexSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, indexSchema))
  }

  /** Fold committed batch dirs into one consolidated `c<upTo>/` dir
    * (default upTo: max batch − 1, keeping the newest batch replayable) —
    * see [[BatchDirs.compact]] for the durability contract.
    */
  def compact(spark: SparkSession, indexDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, indexDir, indexSchema, None, upToOpt)

  /** The signature index exactly as it stood after batch `asOf` committed
    * — rows with `batch_id <= asOf`, read from the CURRENT files (the
    * highest compacted dir plus the live batch dirs beyond it). Exact
    * through compaction: folding only relocates rows, each of which keeps
    * its ingest stamp.
    */
  def indexAsOf(spark: SparkSession, indexDir: String,
      asOf: Long): DataFrame = {
    val maxC = BatchDirs.listDirs(indexDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(indexDir, "b")
      .filter { case (id, _) => id > maxC.fold(-1L)(_._1) }.map(_._2)
    BatchDirs.readUnion(spark, dirs, indexSchema, partitioned = false)
      .getOrElse(BatchDirs.emptyFrame(spark, indexSchema))
      .where(col("batch_id") <= asOf)
  }

  /** TIME-TRAVEL screening: the near-dup pairs that ingesting `queries`
    * right after batch `asOf` WOULD have produced — the same probe body
    * [[processBatch]] runs (sign the queries once, LSH-probe the
    * historical index, exact-verify candidates, plus within-query pairs),
    * against [[indexAsOf]] instead of the live index. Reproduces any
    * batch's recorded pair output from current files (replay audit), and
    * answers the point-in-time question "would this doc have been flagged
    * a duplicate at version N?" without touching the live state. Returns
    * (id1, id2, jaccard), id1 < id2, jaccard ≥ cfg.threshold, at least
    * one side a query. Query ids must be disjoint from historical ids
    * (the [[Dedup.incrementalLshPairs]] caller contract).
    */
  def probeAsOf(spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, textCol: String, asOf: Long,
      cfg: Config = Config()): DataFrame = {
    val hist = indexAsOf(spark, indexDir, asOf)
    val delta = queries.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    val sigs = graft.Exec.materialize(delta.select(col("id"),
        TextFns.minhashSigNative(
          TextFns.wordShinglesNative(col("text"), cfg.nGram),
          cfg.numPerm, cfg.seed).as("sig"),
        col("text"))
      .where(size(col("sig")) > 0))
    val docs = sigs.select("id", "text")
      .unionByName(hist.select("id", "text"))
    Dedup.incrementalLshPairs(docs, "id", "text",
      hist.select("id", "sig"), sigs.select("id"),
      cfg.nGram, cfg.numPerm, cfg.bands, cfg.threshold, cfg.seed,
      deltaSigsOpt = Some(sigs.select("id", "sig")))
  }

  /** One micro-batch: sign, persist signatures, probe, persist pairs.
    * Exposed for direct (non-streaming) batch ingestion too.
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String, pairsDir: String,
      cfg: Config = Config()): Unit = {
    val spark = batch.sparkSession
    val delta = batch.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    // sign once; the persisted frame is both the index entry and the
    // probe-side signatures for this batch's pair computation
    val sigs = delta.select(col("id"),
        TextFns.minhashSigNative(
          TextFns.wordShinglesNative(col("text"), cfg.nGram),
          cfg.numPerm, cfg.seed).as("sig"),
        col("text"))
      .where(size(col("sig")) > 0)
      .withColumn("batch_id", lit(batchId))
    sigs.write.mode("overwrite").parquet(s"$indexDir/b$batchId")
    val written = spark.read.schema(indexSchema).parquet(s"$indexDir/b$batchId")
    val prior = priorIndex(spark, indexDir, batchId)
    val docs = written.select("id", "text")
      .unionByName(prior.select("id", "text"))
    val pairs = Dedup.incrementalLshPairs(docs, "id", "text",
      prior.select("id", "sig"), written.select("id"),
      cfg.nGram, cfg.numPerm, cfg.bands, cfg.threshold, cfg.seed,
      deltaSigsOpt = Some(written.select("id", "sig")))
    pairs.write.mode("overwrite").parquet(s"$pairsDir/b$batchId")
  }

  /** Attach to a streaming document source: (idCol LONG-castable,
    * textCol STRING). Pairs accumulate under `pairsDir/b<batch>/`; the
    * union over batches equals the full corpus pair set restricted to
    * cross/within-batch-boundary pairs as batches arrive (StreamingSpec
    * asserts union == the one-shot batch pair set).
    */
  def attach(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, pairsDir: String, checkpointDir: String,
      cfg: Config = Config()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, pairsDir, cfg)
        ()
      }
      .start()
}
