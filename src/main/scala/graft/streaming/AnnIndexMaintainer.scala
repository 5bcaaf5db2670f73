package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.Ann

/** Streaming ANN index maintenance — the similarity-search face of the R17
  * maintenance idea (recathon.c:951-1203) for a continuously-ingested
  * embedding corpus: each micro-batch of vectors is assigned its IVF cell
  * ONCE (codegen'd nearest-centroid loop against the fixed, pre-trained
  * coarse quantizer) and appended to a persistent inverted file laid out as
  * `cell=<id>/` parquet partitions, so a query probes `nprobe` cells of the
  * whole accumulated corpus with static partition pruning — per-batch write
  * cost tracks the batch, per-query read cost tracks nprobe/nlist of the
  * corpus, and nothing is ever re-assigned or re-indexed.
  *
  * Centroids are deliberately FROZEN (trained once, e.g. on the bootstrap
  * corpus via [[graft.ops.Ann.ivfTrain]]): a coarse quantizer's recall comes
  * from nprobe, not centroid freshness, and FAISS-style practice is to
  * re-train offline and rebuild rather than drift centroids under a live
  * index (a moved centroid silently invalidates every already-assigned
  * row's cell).
  *
  * Durability layout: same contract as [[NearDupMaintainer]] — one
  * overwrite-idempotent `b<batchId>/` dir per batch (each internally
  * partitioned by cell), so a crash-replay rewrites its dir byte-identically
  * and can neither double-append nor observe its own partial output.
  */
object AnnIndexMaintainer {

  private val indexSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("v", ArrayType(DoubleType), nullable = true),
    StructField("batch_id", LongType),
    StructField("cell", IntegerType)))

  /** One micro-batch: assign cells, persist as a cell-partitioned batch dir.
    * Exposed for direct (non-streaming) batch ingestion too. Each row
    * carries its ingest batch id — the version axis [[searchAsOf]]
    * time-travels on: the inverted file is append-only, so every
    * historical index version stays addressable from the CURRENT files
    * even after [[compact]] folds batch dirs (the fold preserves
    * `batch_id`).
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, cents: Array[Array[Double]], indexDir: String,
      roundScale: Int = -1): Unit = {
    batch.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("batch_id", lit(batchId))
      .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
        col("v"), cents, roundScale))
      // cluster by cell before the partitioned write: without this every
      // task emits a file per distinct cell it holds (≈ tasks × nlist tiny
      // files per batch — quadratic-feeling FS overhead once nlist follows
      // the √N law); clustered, the batch writes ≈ one file per cell
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/b$batchId")
  }

  /** The accumulated inverted file: the highest compacted dir (covering all
    * batches ≤ its id) plus every batch dir above it, each read with its own
    * basePath so the `cell=` directory column survives — a `cell IN (...)`
    * filter prunes whole partition directories in every branch of the union.
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val maxC = BatchDirs.listDirs(indexDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(indexDir, "b")
      .filter(_._1 > maxC.fold(-1L)(_._1)).map(_._2)
    BatchDirs.readUnion(spark, dirs, indexSchema, partitioned = true)
      .getOrElse(BatchDirs.emptyFrame(spark, indexSchema))
  }

  /** Fold committed batch dirs into one consolidated, still-cell-partitioned
    * `c<upTo>/` dir (default upTo: max batch − 1, keeping the newest batch
    * replayable) — see [[BatchDirs.compact]] for the durability contract.
    */
  def compact(spark: SparkSession, indexDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, indexDir, indexSchema, Some("cell"), upToOpt)

  /** Probe the persistent index: top-k cosine neighbors per query vector.
    * Probe cells are computed DRIVER-SIDE ([[Ann.nearestCellsLocal]] — the
    * same distance form the distributed probe uses) so the scan carries a
    * static `cell IN (...)` predicate that prunes partition directories
    * before any file is opened; scoring and ranking are
    * [[Ann.ivfSearchAssigned]], identical to the one-shot IVF path.
    */
  def search(spark: SparkSession, indexDir: String,
      cents: Array[Array[Double]], queryVecs: Seq[(Long, Array[Double])],
      k: Int, nprobe: Int = 4,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val probeCells = queryVecs
      .flatMap(q => Ann.nearestCellsLocal(q._2, cents, nprobe)).distinct
    val idx = readIndex(spark, indexDir)
      .where(col("cell").isin(probeCells: _*))
    val qdf = queryVecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    Ann.ivfSearchAssigned(idx, qdf, "id", "v", k, nprobe, cents,
      rankOnRoundedTo)
  }

  /** TIME-TRAVEL probe: the top-k exactly as the index answered after
    * batch `asOf` committed — the scan sees only rows with
    * `batch_id <= asOf` (read from the CURRENT files; exact through
    * compaction because the inverted file is append-only). Partition
    * pruning is unchanged: the `cell IN (...)` filter lands before the
    * version predicate.
    */
  def searchAsOf(spark: SparkSession, indexDir: String,
      cents: Array[Array[Double]], queryVecs: Seq[(Long, Array[Double])],
      k: Int, asOf: Long, nprobe: Int = 4,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val probeCells = queryVecs
      .flatMap(q => Ann.nearestCellsLocal(q._2, cents, nprobe)).distinct
    val idx = readIndex(spark, indexDir)
      .where(col("cell").isin(probeCells: _*) && col("batch_id") <= asOf)
    val qdf = queryVecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    Ann.ivfSearchAssigned(idx, qdf, "id", "v", k, nprobe, cents,
      rankOnRoundedTo)
  }

  // ---- drift-monitored maintenance: distortion metrics + offline retrain --

  private val metricsSchema: StructType = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("n", LongType),
    StructField("sum_d2", DoubleType)))

  /** [[processBatch]] plus a per-batch QUANTIZATION-DISTORTION record — the
    * drift signal for the frozen-quantizer policy. The batch's rows (read
    * back from the dir the batch just wrote — the metric measures what the
    * index actually holds) join the broadcast centroid frame on their
    * assigned cell and accumulate Σ‖v − c(cell)‖² = Σ(v·v − 2·v·c + c·c)
    * (three codegen dots, one map-side agg) into
    * `indexDir/m/b<batchId>` as (batch_id, n, sum_d2). The sufficient
    * statistic is mergeable, so the drift decision ([[driftRatio]]) is two
    * sums over a per-batch-sized sidecar — never a corpus re-scan — and
    * the write is overwrite-idempotent (replay recomputes the identical
    * row from the identically-rewritten batch dir).
    */
  def processBatchMonitored(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, cents: Array[Array[Double]], indexDir: String,
      roundScale: Int = -1): Unit = {
    processBatch(batch, batchId, idCol, vecCol, cents, indexDir, roundScale)
    val spark = batch.sparkSession
    val written = spark.read.schema(indexSchema)
      .option("basePath", s"$indexDir/b$batchId")
      .parquet(s"$indexDir/b$batchId")
    writeMetrics(spark, written, batchId, cents, indexDir)
  }

  private def writeMetrics(spark: SparkSession, rows: DataFrame,
      batchId: Long, cents: Array[Array[Double]], indexDir: String): Unit = {
    import spark.implicits._
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "c")
    rows.join(broadcast(centsDf), Seq("cell"))
      .select((graft.functions.VectorFns.dotNative(col("v"), col("v"))
        - lit(2.0) * graft.functions.VectorFns.dotNative(col("v"), col("c"))
        + graft.functions.VectorFns.dotNative(col("c"), col("c"))).as("d2"))
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(col("d2")), lit(0.0)).as("sum_d2"))
      .select(lit(batchId).as("batch_id"), col("n"), col("sum_d2"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/m/b$batchId")
  }

  /** Record that the active quantizer was trained with batch `batchId` as
    * the last batch of its training-era data — the baseline horizon
    * [[driftRatio]] splits the metrics at. Marker-dir rendering (the
    * [[CurateMaintainer]] `selbase` pattern): crash-safe because it is
    * written AFTER the quantizer artifact exists.
    */
  def markTrained(indexDir: String, batchId: Long): Unit = {
    new java.io.File(indexDir, s"trainbase$batchId").mkdirs()
    ()
  }

  /** The baseline horizon (−1 when never marked). */
  def trainedBatch(indexDir: String): Long =
    Option(new java.io.File(indexDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("trainbase"))
      .flatMap(_.getName.stripPrefix("trainbase").toLongOption)
      .sorted.lastOption.getOrElse(-1L)

  /** mean ‖v−c‖² of data ingested AFTER the baseline horizon, over the
    * same mean for the training-era data — the FAISS-practice drift
    * signal for a frozen coarse quantizer: recall comes from nprobe while
    * the data distribution holds, but data that lands far from every
    * centroid (ratio ≫ 1) concentrates into few cells and degrades both
    * recall and probe cost, and the remedy is an OFFLINE retrain+rebuild
    * ([[retrain]]), never in-place centroid movement. None while either
    * side of the split is empty or the baseline distortion is zero.
    */
  def driftRatio(spark: SparkSession, indexDir: String): Option[Double] = {
    val base = trainedBatch(indexDir)
    if (base < 0L) return None
    val dirs = BatchDirs.listDirs(s"$indexDir/m", "b").map(_._2)
    val m = BatchDirs.readUnion(spark, dirs, metricsSchema,
      partitioned = false)
      .getOrElse(return None)
    val r = m.agg(
      sum(when(col("batch_id") <= base, col("sum_d2"))).as("bd2"),
      sum(when(col("batch_id") <= base, col("n"))).as("bn"),
      sum(when(col("batch_id") > base, col("sum_d2"))).as("pd2"),
      sum(when(col("batch_id") > base, col("n"))).as("pn")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) return None
    val (bd2, bn, pd2, pn) =
      (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    if (bn == 0L || pn == 0L || bd2 <= 0.0) None
    else Some((pd2 / pn) / (bd2 / bn))
  }

  /** The maintenance decision: retrain when post-baseline distortion has
    * drifted past `ratioThreshold`× the training-era distortion. */
  def shouldRetrain(spark: SparkSession, indexDir: String,
      ratioThreshold: Double): Boolean =
    driftRatio(spark, indexDir).exists(_ >= ratioThreshold)

  /** Offline re-train + REBUILD — the remedy side of the frozen-centroid
    * policy (class doc): train a fresh √N-law quantizer
    * ([[graft.ops.Ann.ivfTrainBalanced]]) on the ACCUMULATED corpus, then
    * re-assign every row in one pass and land the rebuilt inverted file in
    * `newIndexDir` as a single consolidated `c<maxBatch>/` dir. Rows keep
    * their ingest `batch_id`, so [[searchAsOf]] reproduces every
    * historical answer through the rebuild; the metrics sidecar restarts
    * with the whole-corpus distortion under the fresh quantizer as the new
    * baseline, and the caller swaps serving to `newIndexDir` (the
    * previous-generation dir stays readable while in-flight queries
    * drain — the served-view re-materialization discipline). Returns the
    * retrained centroid frame for the caller to persist.
    */
  def retrain(spark: SparkSession, indexDir: String, newIndexDir: String,
      cellsPerSqrtN: Int = 4, roundScale: Int = -1): DataFrame = {
    // guards BEFORE any destructive step: the rebuild must land in a NEW
    // generation (the old dir stays readable while in-flight queries
    // drain — same-path retrain would destroy the live index), and an
    // empty state has nothing to rebuild (and would otherwise surface as
    // an opaque empty-max error below)
    require(new java.io.File(newIndexDir).getCanonicalPath !=
        new java.io.File(indexDir).getCanonicalPath,
      s"retrain target '$newIndexDir' must be a new generation dir, not " +
        s"the live index dir '$indexDir'")
    val gens = BatchDirs.listDirs(indexDir, "b") ++
      BatchDirs.listDirs(indexDir, "c")
    require(gens.nonEmpty,
      s"retrain: no batch or compacted dirs under '$indexDir' — nothing " +
        "to rebuild")
    val maxB = gens.map(_._1).max
    val idx = readIndex(spark, indexDir).select("id", "v", "batch_id")
    val (cdf, _) = graft.ops.Ann.ivfTrainBalanced(idx, "v", cellsPerSqrtN)
    val cents = graft.ops.Ann.ivfCentroidsFromDf(cdf)
    graft.Exec.deletePath(newIndexDir)
    idx.withColumn("cell", graft.functions.VectorFns.nearestCellNative(
        col("v"), cents, roundScale))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$newIndexDir/c$maxB")
    val rebuilt = spark.read.schema(indexSchema)
      .option("basePath", s"$newIndexDir/c$maxB")
      .parquet(s"$newIndexDir/c$maxB")
    writeMetrics(spark, rebuilt, maxB, cents, newIndexDir)
    markTrained(newIndexDir, maxB)
    cdf
  }

  // ---- IVF-PQ variant: the inverted file carries PQ codes alongside ----

  private val indexPqSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("v", ArrayType(DoubleType), nullable = true),
    StructField("codes", ArrayType(IntegerType), nullable = true),
    StructField("rn2", DoubleType),
    StructField("batch_id", LongType),
    StructField("cell", IntegerType)))

  /** [[processBatch]] with PQ codes: each row is cell-assigned AND encoded
    * against the frozen codebooks in the same pass, so the accumulated
    * inverted file serves [[searchPq]] (ADC over m-byte codes) without any
    * re-encoding — the streaming face of [[Ann.ivfPqTopK]]. Codebooks are
    * frozen for the same reason centroids are: a changed codebook silently
    * invalidates every already-written code.
    */
  def processBatchPq(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], indexDir: String,
      roundScale: Int = -1): Unit = {
    val asn = batch.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
        col("v"), cents, roundScale))
    asn.join(
        Ann.pqEncode(asn, "id", "v", codebooks,
          if (roundScale >= 0) Some(roundScale) else None),
        Seq("id"))
      .select(col("id"), col("v"), col("codes"), col("rn2"),
        lit(batchId).as("batch_id"), col("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/b$batchId")
  }

  /** The accumulated PQ inverted file ([[readIndex]]'s contract, code-bearing
    * schema).
    */
  def readIndexPq(spark: SparkSession, indexDir: String): DataFrame = {
    val maxC = BatchDirs.listDirs(indexDir, "c").lastOption
    val dirs = maxC.map(_._2).toSeq ++ BatchDirs.listDirs(indexDir, "b")
      .filter(_._1 > maxC.fold(-1L)(_._1)).map(_._2)
    BatchDirs.readUnion(spark, dirs, indexPqSchema, partitioned = true)
      .getOrElse(BatchDirs.emptyFrame(spark, indexPqSchema))
  }

  def compactPq(spark: SparkSession, indexDir: String,
      upToOpt: Option[Long] = None): Unit =
    BatchDirs.compact(spark, indexDir, indexPqSchema, Some("cell"), upToOpt)

  /** Probe the PQ index: driver-computed `cell IN (...)` partition pruning,
    * then [[Ann.ivfPqTopK]]'s ADC + exact-rerank stages over the persisted
    * (id, cell, codes, rn2) — the original vectors are read only for the
    * shortlist join, and nothing is re-assigned or re-encoded per query.
    */
  def searchPq(spark: SparkSession, indexDir: String,
      cents: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      queryVecs: Seq[(Long, Array[Double])], k: Int, nprobe: Int = 4,
      rerank: Int = 4, rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val probeCells = queryVecs
      .flatMap(q => Ann.nearestCellsLocal(q._2, cents, nprobe)).distinct
    val idx = readIndexPq(spark, indexDir)
      .where(col("cell").isin(probeCells: _*))
    val qdf = queryVecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    Ann.ivfPqTopK(idx.select(col("id"), col("v")), qdf, "id", "v", k,
      cents, codebooks, nprobe, rerank, rankOnRoundedTo,
      indexOpt = Some(idx.select("id", "cell", "codes", "rn2")))
  }

  /** Attach to a streaming embedding source: (idCol LONG-castable, vecCol
    * ARRAY<numeric>). The index accumulates under `indexDir/b<batch>/`;
    * [[search]] over it equals [[Ann.ivfTopK]] over the union corpus with
    * the same frozen centroids (StreamingSpec asserts exact parity).
    */
  def attach(embeddings: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], indexDir: String,
      checkpointDir: String): StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol, cents, indexDir)
        ()
      }
      .start()
}
