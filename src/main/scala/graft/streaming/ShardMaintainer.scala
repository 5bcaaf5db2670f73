package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Append-stable shard-file maintenance — the streaming face of
  * [[graft.ops.Corpus.writeShards]]: packed payload rows (seq_id, ids_str,
  * n_tok) arrive in micro-batches and EXTEND the on-disk hive-partitioned
  * shard layout (`epoch=…/shard_id=…`) instead of rewriting it.
  *
  * The order law is [[Packing.epochOrderBatchMajor]] (batch-major, md5
  * draw within batch): an ingested sequence's (epoch, ord) never changes
  * when later data arrives, so a batch touches exactly
  *   - the boundary shard (the last, possibly partial, pre-batch shard),
  *     whose surviving rows are merged with the delta's head, and
  *   - the strictly-new shards the delta fills —
  * ≤ ⌈nΔ/shardSize⌉ + 1 partitions per epoch, cost ∝ delta. The global
  * md5 shuffle ([[Packing.epochOrder]], used by the one-shot
  * [[graft.ops.Corpus.trainShards]]) would reshuffle every ord on any
  * growth and force a full-corpus rewrite per batch; batch-major trades
  * corpus-wide epoch mixing for that append-stability (documented on
  * [[Packing.epochOrderBatchMajor]]).
  *
  * Replay safety (the [[BatchDirs]] `b<batchId>/` discipline, rendered
  * here as one sidecar dir per batch plus a `batch_id` column in the data
  * files): the base offset counts only batches STRICTLY before the
  * current id, and the boundary merge drops rows the crashed attempt
  * itself wrote — replaying a batch rewrites byte-identical content.
  * Partition updates use dynamic partition overwrite, the same move a
  * transactional table format (or a rename-based commit) supplies on a
  * real cluster.
  */
object ShardMaintainer {

  private def dataDir(dir: String) = s"$dir/data"
  private def metaDir(dir: String) = s"$dir/meta"

  /** Items ingested by batches strictly before `batchId` (replay-safe:
    * a crashed attempt's own sidecar is excluded by the strict bound). */
  def countBefore(spark: SparkSession, dir: String, batchId: Long): Long = {
    val metas = BatchDirs.listDirs(metaDir(dir), "b")
      .filter(_._1 < batchId).map(_._2)
    if (metas.isEmpty) 0L
    else spark.read.parquet(metas: _*)
      .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
  }

  /** Ingest one micro-batch of payload rows (seq_id, ids_str, n_tok).
    * `epochs` and `shardSize` are layout constants of the directory and
    * must be identical across every batch fed to it.
    */
  def processBatch(payload: DataFrame, batchId: Long, epochs: Int,
      shardSize: Int, dir: String): Unit = {
    require(shardSize >= 1, "shardSize must be >= 1")
    val spark = payload.sparkSession
    // eager-materialized: the delta feeds both the order build and the
    // shard join (the CurateMaintainer localCheckpoint rule)
    val p = graft.Exec.materializeLocal(
      payload.select(col("seq_id"), col("ids_str"), col("n_tok")))
    val nDelta = p.count()
    val base = countBefore(spark, dir, batchId)
    if (nDelta == 0L) { writeMeta(spark, dir, batchId, 0L); return }
    val fresh = Packing.epochOrderAppended(p.select(col("seq_id")),
        "seq_id", epochs, base)
      .withColumn("shard_id",
        floor(col("ord") / shardSize).cast("long"))
      .join(p, Seq("seq_id"))
      .select(col("epoch"), col("shard_id"), col("seq_id"), col("ord"),
        col("n_tok"), col("ids_str"), lit(batchId).as("batch_id"))
    val boundary = base / shardSize
    val withPrev =
      if (base % shardSize == 0L) fresh
      else fresh.unionByName(
        spark.read.parquet(dataDir(dir))
          .where(col("shard_id") === boundary &&
            col("batch_id") < batchId)
          .select(col("epoch").cast("int").as("epoch"),
            col("shard_id").cast("long").as("shard_id"),
            col("seq_id").cast("long").as("seq_id"),
            col("ord").cast("long").as("ord"),
            col("n_tok").cast("long").as("n_tok"), col("ids_str"),
            col("batch_id").cast("long").as("batch_id")))
    // eager checkpoint: the write replaces partitions its own lineage
    // read (the boundary shard) — rows must be off those files first
    val rows = graft.Exec.materializeLocal(withPrev)
    rows.repartition(
        math.max(1, spark.sparkContext.defaultParallelism / 2),
        col("epoch"), col("shard_id"))
      .sortWithinPartitions(col("epoch"), col("shard_id"), col("ord"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch", "shard_id").parquet(dataDir(dir))
    writeMeta(spark, dir, batchId, nDelta)
  }

  /** RECONCILE the layout against the CURRENT full selection — the
    * retroactivity policy for curation-fed shards: incremental curation
    * can retroactively DE-select an already-sharded sequence (a late
    * duplicate displaces it, a budget re-ranking drops it). Policy:
    *   - sequences in `selection` but not yet ingested are appended via
    *     [[processBatch]] (their ords extend the batch-major order);
    *   - sequences ingested but no longer selected are TOMBSTONED
    *     (`tomb/b<batchId>` sidecars, a read-time anti-join in
    *     [[readShardsLive]]) — never a shard rewrite, so write cost stays
    *     ∝ delta and surviving ords never move (holes remain where
    *     tombstoned ords were; the data loader skips them).
    * A tombstone-heavy layout can be compacted by a full rewrite when the
    * dead fraction warrants it (the LSM trade; not needed while removal
    * rates are curation-typical). Replay-safe: the current batch's own
    * prior tombstone write is excluded from the "already tombstoned"
    * view, so a crashed reconcile rewrites identical content.
    */
  def reconcile(selection: DataFrame, batchId: Long, epochs: Int,
      shardSize: Int, dir: String): Unit = {
    val spark = selection.sparkSession
    val p = graft.Exec.materializeLocal(
      selection.select(col("seq_id"), col("ids_str"), col("n_tok")))
    val have = ingestedSeqIds(spark, dir)
    val fresh = p.join(have, Seq("seq_id"), "left_anti")
    val removed = have
      .join(p.select("seq_id"), Seq("seq_id"), "left_anti")
      .join(tombstonesBefore(spark, dir, batchId), Seq("seq_id"),
        "left_anti")
    graft.Exec.materializeLocal(removed).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/tomb/b$batchId")
    processBatch(fresh, batchId, epochs, shardSize, dir)
  }

  /** Every seq id ever ingested (live + tombstoned) — epoch 1's rows,
    * partition-pruned. Empty before the first batch. */
  private def ingestedSeqIds(spark: SparkSession,
      dir: String): DataFrame =
    if (!new java.io.File(dataDir(dir)).exists())
      spark.range(0).select(col("id").as("seq_id"))
    else spark.read.parquet(dataDir(dir)).where(col("epoch") === 1)
      .select(col("seq_id").cast("long").as("seq_id"))

  private def tombstonesBefore(spark: SparkSession, dir: String,
      batchId: Long): DataFrame = {
    val dirs = BatchDirs.listDirs(s"$dir/tomb", "b")
      .filter(_._1 < batchId).map(_._2)
    if (dirs.isEmpty) spark.range(0).select(col("id").as("seq_id"))
    else spark.read.parquet(dirs: _*)
      .select(col("seq_id").cast("long").as("seq_id"))
  }

  /** All tombstoned seq ids. */
  def tombstones(spark: SparkSession, dir: String): DataFrame =
    tombstonesBefore(spark, dir, Long.MaxValue)

  /** [[readShards]] minus tombstoned sequences — what the data loader
    * consumes after reconciles (surviving ords unchanged, holes where
    * de-selected sequences sat).
    */
  def readShardsLive(spark: SparkSession, dir: String): DataFrame =
    readShards(spark, dir)
      .join(tombstones(spark, dir), Seq("seq_id"), "left_anti")

  /** COMPACT a tombstone-heavy layout: rewrite the data dir with every
    * row tombstoned by batches ≤ `upTo` physically dropped, then retire
    * those tombstone sidecars — the LSM rewrite the reconcile policy
    * defers until the dead fraction warrants it ([[deadFraction]] is the
    * trigger measurement). The live view is BIT-IDENTICAL before and
    * after (surviving rows rewrite verbatim, batch_id included, ords
    * never move), and as-of reads at horizons ≥ upTo still answer
    * exactly. HISTORY SEAL, documented: horizons < upTo can no longer
    * resurrect rows whose tombstones were folded — compaction trades
    * time-travel depth for scan width, the same trade a table format's
    * VACUUM makes; compact only below your oldest pinned corpus version.
    * Crash-safe via the rename-aside swap ([[graft.sources.Layout]]'s
    * compact discipline); sidecars are deleted only after the swap lands.
    */
  def compactTombstones(spark: SparkSession, dir: String,
      upTo: Long): Unit = {
    val d = dataDir(dir)
    if (!new java.io.File(d).exists()) return
    val tmp = d + ".__compact"
    graft.Exec.deletePath(tmp)
    spark.read.parquet(d)
      .join(tombstonesBefore(spark, dir, upTo + 1L), Seq("seq_id"),
        "left_anti")
      .repartition(math.max(1, spark.sparkContext.defaultParallelism / 2),
        col("epoch"), col("shard_id"))
      .sortWithinPartitions(col("epoch"), col("shard_id"), col("ord"))
      .write.mode("overwrite").partitionBy("epoch", "shard_id").parquet(tmp)
    val old = new java.io.File(d + ".__old")
    graft.Exec.deletePath(old.getPath)
    if (!new java.io.File(d).renameTo(old))
      throw new java.io.IOException(s"compact swap failed: $d -> $old")
    if (!new java.io.File(tmp).renameTo(new java.io.File(d))) {
      old.renameTo(new java.io.File(d)) // restore; best-effort
      throw new java.io.IOException(s"compact swap failed: $tmp -> $d")
    }
    graft.Exec.deletePath(old.getPath)
    BatchDirs.listDirs(s"$dir/tomb", "b").filter(_._1 <= upTo)
      .foreach { case (_, p) => graft.Exec.deletePath(p) }
  }

  /** Dead fraction of the layout — tombstoned seq ids over ingested seq
    * ids (epoch 1 counts; every epoch carries the same seq set). The
    * measured quantity a maintenance loop thresholds to decide when
    * [[compactTombstones]] pays for itself.
    */
  def deadFraction(spark: SparkSession, dir: String): Double = {
    val n = ingestedSeqIds(spark, dir).count()
    if (n == 0L) 0.0
    else tombstones(spark, dir).count().toDouble / n
  }

  /** TIME-TRAVEL read: the layout exactly as a data loader saw it after
    * batch `asOf` committed — data rows written by batches ≤ asOf minus
    * tombstones written by batches ≤ asOf. Every historical corpus
    * version stays addressable from the SAME files (`batch_id` is the
    * version axis; no snapshot copies), which is the data-versioning
    * contract a training run pins its exact corpus with: re-reading at
    * the run's recorded horizon reproduces its input bit-for-bit, however
    * much the layout has grown or reconciled since. Batch-major ords make
    * this exact — later batches only APPEND ranks, so the as-of slice IS
    * the state that existed then. Cost: the batch_id predicate prunes
    * row groups; the tombstone anti-join is sized by removals, not the
    * corpus.
    */
  def readShardsAsOf(spark: SparkSession, dir: String,
      asOf: Long): DataFrame =
    spark.read.parquet(dataDir(dir))
      .where(col("batch_id") <= asOf)
      .select(col("epoch").cast("int").as("epoch"),
        col("shard_id").cast("long").as("shard_id"),
        col("seq_id").cast("long").as("seq_id"),
        col("ord").cast("long").as("ord"),
        col("n_tok").cast("long").as("n_tok"), col("ids_str"))
      .join(tombstonesBefore(spark, dir, asOf + 1L), Seq("seq_id"),
        "left_anti")

  /** Re-read the maintained layout in [[graft.ops.Corpus.readShards]]'
    * shape (the `batch_id` bookkeeping column stays internal).
    */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dataDir(dir))
      .select(col("epoch").cast("int").as("epoch"),
        col("shard_id").cast("long").as("shard_id"),
        col("seq_id").cast("long").as("seq_id"),
        col("ord").cast("long").as("ord"),
        col("n_tok").cast("long").as("n_tok"), col("ids_str"))

  private def writeMeta(spark: SparkSession, dir: String, batchId: Long,
      n: Long): Unit = {
    import spark.implicits._
    Seq((batchId, n)).toDF("batch_id", "n")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${metaDir(dir)}/b$batchId")
  }
}
