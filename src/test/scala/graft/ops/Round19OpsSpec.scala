package graft.ops

import graft.SparkSpec
import graft.streaming.{AnnIndexMaintainer, BpeMaintainer, CurateMaintainer,
  Retention, SnapshotManifest}
import org.apache.spark.sql.functions.col

/** Specs for the round-19 additions: the tokenizer's version/retention
  * axis (stamped merge versions, [[BpeMaintainer.mergesAsOf]], the
  * pin-aware merge-version vacuum, the `bpe` manifest kind), the
  * PQ-coded manifest kind (`annpq`, horizon-aware through quantizer
  * growths), and the discovery-based fleet GC sweep
  * ([[Retention.discoverStates]] / [[Retention.sweep]]).
  */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corpusDf(texts: Seq[String], base: Long = 0L) =
    texts.zipWithIndex.map { case (t, i) => (base + i, t) }
      .toDF("doc_id", "text")

  private val cfg0 = BpeMaintainer.Config(numMerges = 4, growthFactor = 0.0)

  /** Three learns at batches 0/1/2 (growthFactor 0 fires every wave),
    * distinct corpora per wave. Returns (modelDir, waves). */
  private def threeLearnModel(policyKeepLast: Option[Int])
      : (String, Seq[Seq[String]]) = {
    val base = tmp("bpever")
    val (st, md) = (s"$base/state", s"$base/model")
    policyKeepLast.foreach(k => Retention.setMergesPolicy(md, k))
    val waves = Seq(Seq("aaab aaab aaab", "aab aab"),
      Seq("ccd ccd ccd ccd"), Seq("eef eef eef eef eef"))
    waves.zipWithIndex.foreach { case (w, g) =>
      BpeMaintainer.processBatch(corpusDf(w, 10L * g), g.toLong, "doc_id",
        "text", st, md, cfg0) shouldBe true
    }
    (md, waves)
  }

  // --------------------------- tokenizer version axis (mergesAsOf)

  test("BPE versions carry learn-batch stamps; mergesAsOf resolves the " +
      "serving version; horizons before the first learn fail") {
    val (md, waves) = threeLearnModel(Some(10))
    val vs = BpeMaintainer.versions(md)
    vs.map(v => (v._1, v._2)) shouldBe Seq((0L, 0L), (1L, 1L), (2L, 2L))
    // cumulative word-occurrence totals: 5, 5+4, 5+4+5
    vs.map(_._3) shouldBe Seq(5L, 9L, 14L)
    // the mid horizon == the one-shot learn over exactly that prefix
    BpeMaintainer.mergesAsOf(spark, md, 1L) shouldBe
      Bpe.learnMerges(
        corpusDf(waves(0)).unionByName(corpusDf(waves(1), 10L)),
        "doc_id", "text", 4)
    // past the head: the latest version serves
    BpeMaintainer.mergesAsOf(spark, md, 99L) shouldBe
      BpeMaintainer.latestMerges(spark, md)
    intercept[IllegalArgumentException] {
      BpeMaintainer.mergesAsOf(spark, md, -1L)
    }.getMessage should include("no merges version")
  }

  test("a persisted merges policy flips the model dir APPEND-ONLY; " +
      "without one the legacy keep-two window applies at commit") {
    val (mdP, _) = threeLearnModel(Some(5))
    BpeMaintainer.versions(mdP).map(_._1) shouldBe Seq(0L, 1L, 2L)
    val (mdL, _) = threeLearnModel(None)
    BpeMaintainer.versions(mdL).map(_._1) shouldBe Seq(1L, 2L)
  }

  // --------------------------- pin-aware merge-version vacuum

  test("vacuumMergeVersions: pins hold the floor down, the floor commits " +
      "before drops, below-floor reads report the vacuum, a missing " +
      "manifest fails the vacuum") {
    val (md, waves) = threeLearnModel(Some(1)) // policy alone keeps the head
    val m = tmp("bpepin") + "/manifest"
    SnapshotManifest.pin(spark,
      Seq(SnapshotManifest.Pin("tok", "bpe", md, 1L)), m)
    // fail-safe: a misplaced manifest dir fails the vacuum outright
    intercept[Exception] {
      Retention.vacuumMergeVersions(spark, md,
        manifestDirs = Seq(m + "_nonexistent"))
    }
    BpeMaintainer.versions(md).map(_._1) shouldBe Seq(0L, 1L, 2L)
    // pin at 1 lowers the keepLast=1 floor (head, batch 2) to 1 → only
    // v0 is superseded; dry run and vacuum agree
    Retention.staleMergeVersions(spark, md,
      manifestDirs = Seq(m)) shouldBe Seq(0L)
    Retention.vacuumMergeVersions(spark, md,
      manifestDirs = Seq(m)) shouldBe Seq(0L)
    BpeMaintainer.versions(md).map(_._1) shouldBe Seq(1L, 2L)
    // the pinned horizon still serves — through the manifest and the API
    val asof1 = BpeMaintainer.mergesAsOf(spark, md, 1L)
    asof1 shouldBe Bpe.learnMerges(
      corpusDf(waves(0)).unionByName(corpusDf(waves(1), 10L)),
      "doc_id", "text", 4)
    SnapshotManifest.readState(spark, m, "tok")
      .count() shouldBe asof1.size.toLong
    SnapshotManifest.verify(spark, m).where(!col("ok")).count() shouldBe 0L
    // below the committed floor: the explicit retention error
    intercept[IllegalArgumentException] {
      BpeMaintainer.mergesAsOf(spark, md, 0L)
    }.getMessage should include("retention floor")
    // idempotent re-run
    Retention.vacuumMergeVersions(spark, md,
      manifestDirs = Seq(m)) shouldBe empty
  }

  test("SnapshotManifest kind bpe: a horizon before the first learn " +
      "fails AT PIN TIME") {
    val (md, _) = threeLearnModel(Some(5))
    intercept[IllegalArgumentException] {
      SnapshotManifest.pin(spark,
        Seq(SnapshotManifest.Pin("tok", "bpe", md, -1L)),
        tmp("bpebad") + "/m")
    }.getMessage should include("no merges version")
  }

  // --------------------------- PQ-coded manifest kind (annpq)

  private def vecs(ids: Seq[Long], shift: Double = 0.0) =
    ids.map(i => (i, Seq(
      (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * (i % 3) + shift,
      (if (i % 2 == 0) 0.0 else 1.0) + shift)))
      .toDF("vec_id", "embedding")

  test("SnapshotManifest kind annpq: a pin above a quantizer growth " +
      "serves each mover exactly once with its codes; empty horizons " +
      "fail at pin time") {
    val dir = tmp("annpqpin")
    val cents2 = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cb: Array[Array[Array[Double]]] =
      Array(Array(Array(0.0), Array(1.0), Array(6.0)),
        Array(Array(0.0), Array(1.0), Array(6.0)))
    AnnIndexMaintainer.processBatchPq(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents2, cb, dir)
    AnnIndexMaintainer.markTrained(dir, 0L)
    AnnIndexMaintainer.processBatchPq(vecs(10L to 19L, shift = 5.0), 1L,
      "vec_id", "embedding", cents2, cb, dir)
    AnnIndexMaintainer.growPq(spark, dir, cents2, kNew = 2) // growth at 2
    val m = tmp("annpqm") + "/manifest"
    SnapshotManifest.pin(spark, Seq(
      SnapshotManifest.Pin("atg", "annpq", dir, 2L),
      SnapshotManifest.Pin("below", "annpq", dir, 0L)), m)
    val atg = SnapshotManifest.readState(spark, m, "atg")
    atg.count() shouldBe 20L
    atg.select("id").distinct().count() shouldBe 20L
    atg.schema.fieldNames should contain("codes")
    SnapshotManifest.readState(spark, m, "below").count() shouldBe 10L
    intercept[IllegalArgumentException] {
      SnapshotManifest.pin(spark,
        Seq(SnapshotManifest.Pin("e", "annpq", dir, -1L)),
        tmp("annpqbad") + "/m")
    }.getMessage should include("EMPTY")
  }

  // --------------------------- discovery-based fleet GC

  // passes every gopher rule (the Round16OpsSpec fixture)
  private def doc(id: Long, extra: String) = (id,
    "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch quietly from the tall grass near slowly running water today " +
      extra)

  test("discoverStates + sweep: the walk recognizes all three families " +
      "and stops at state roots; pins protect through the sweep; dry " +
      "run == vacuum; the post sweep is empty") {
    val root = tmp("gcroot")
    // curation state, nested two levels down, generations s0 and s2
    val cur = s"$root/a/cur"
    val w0 = Seq(doc(6L, "alpha beta"), doc(9L, "gamma delta"))
      .toDF("doc_id", "text")
    val w2 = w0.unionByName(
      Seq(doc(11L, "alpha gamma")).toDF("doc_id", "text"))
    CurateMaintainer.deriveSelection(w0, 0L, "doc_id", "text", 30, cur,
      pplKeepBelow = 1000.0)
    CurateMaintainer.deriveSelection(w2, 2L, "doc_id", "text", 30, cur,
      pplKeepBelow = 1000.0)
    // quantizer-versioned index: generations qg0 and qg2
    val knn = s"$root/b/knn"
    val cdf = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cid", "c")
    AnnIndexMaintainer.persistCentroids(spark, knn, 0L, cdf)
    AnnIndexMaintainer.persistCentroids(spark, knn, 2L, cdf)
    // merges model (policy keepLast=1): versions v0..v2
    val tok = s"$root/tok"
    Retention.setMergesPolicy(tok, 1)
    val waves = Seq(Seq("aaab aaab aaab", "aab aab"),
      Seq("ccd ccd ccd ccd"), Seq("eef eef eef eef eef"))
    waves.zipWithIndex.foreach { case (w, g) =>
      BpeMaintainer.processBatch(corpusDf(w, 10L * g), g.toLong, "doc_id",
        "text", s"$root/tokstate", tok, cfg0)
    }
    Retention.discoverStates(root)
      .map(_._1).sorted shouldBe Seq("merges", "quantizer", "selection")
    // pin the curation state's s0 so the sweep may not drop it
    val m = s"$root/manifest"
    SnapshotManifest.pin(spark,
      Seq(SnapshotManifest.Pin("cur", "curate", cur, 0L)), m)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Long)] =
      graft.Exec.materializeLocal(df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    // unpinned dry run WOULD drop the curation s0 too
    rows(Retention.sweep(spark, root, dryRun = true)) shouldBe Seq(
      ("merges", "tok", 0L), ("merges", "tok", 1L),
      ("quantizer", java.nio.file.Paths.get("b", "knn").toString, 0L),
      ("selection", java.nio.file.Paths.get("a", "cur").toString, 0L))
    // with the manifest: the pin shields s0; dry == vacuum; post empty
    val dry = rows(Retention.sweep(spark, root, Seq(m), dryRun = true))
    dry shouldBe Seq(
      ("merges", "tok", 0L), ("merges", "tok", 1L),
      ("quantizer", java.nio.file.Paths.get("b", "knn").toString, 0L))
    rows(Retention.sweep(spark, root, Seq(m))) shouldBe dry
    rows(Retention.sweep(spark, root, Seq(m), dryRun = true)) shouldBe empty
    // the pinned generation survived and still RESOLVES (the micro
    // corpus curates to an empty selection — emptiness is the fixture,
    // not the contract; an unpinned vacuum would have made this read
    // throw the retention error instead)
    noException should be thrownBy
      CurateMaintainer.selectionAsOf(spark, cur, 0L).count()
    // a missing manifest dir fails the WHOLE sweep (fail-safe)
    intercept[Exception] {
      Retention.sweep(spark, root, Seq(m + "_gone"), dryRun = true)
    }
  }

  test("compactTombstonesPinAware: the fold lowers to the oldest shards " +
      "pin, skips a fully-pinned layout, fails on a missing manifest") {
    import graft.streaming.ShardMaintainer
    val dir = tmp("sealpin")
    def payload(ids: Seq[Long]) =
      ids.map(i => (i, s"ids$i", 4L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(payload(0L to 5L), 0L, epochs = 1,
      shardSize = 2, dir)
    ShardMaintainer.reconcile(payload(Seq(1L, 3L, 5L)), 1L, epochs = 1,
      shardSize = 2, dir) // evens tombstoned at batch 1
    ShardMaintainer.reconcile(payload(Seq(1L, 3L)), 2L, epochs = 1,
      shardSize = 2, dir) // 5 tombstoned at batch 2
    val m = tmp("sealpinm") + "/manifest"
    SnapshotManifest.pin(spark,
      Seq(SnapshotManifest.Pin("sh", "shards", dir, 0L)), m)
    // fully pinned at 0: nothing at or below the pin to fold → skip
    ShardMaintainer.compactTombstonesPinAware(spark, dir, 2L,
      Seq(m)) shouldBe -1L
    ShardMaintainer.sealedHorizon(dir) shouldBe -1L
    // fail-safe: a misplaced manifest fails the fold outright
    intercept[Exception] {
      ShardMaintainer.compactTombstonesPinAware(spark, dir, 2L,
        Seq(m + "_gone"))
    }
    // pin moved to 1 → the fold lowers its horizon to the pin
    SnapshotManifest.pin(spark,
      Seq(SnapshotManifest.Pin("sh", "shards", dir, 1L)), m)
    ShardMaintainer.compactTombstonesPinAware(spark, dir, 2L,
      Seq(m)) shouldBe 1L
    ShardMaintainer.sealedHorizon(dir) shouldBe 1L
    ShardMaintainer.readShardsAsOf(spark, dir, 1L).count() shouldBe 3L
    intercept[IllegalArgumentException] {
      ShardMaintainer.readShardsAsOf(spark, dir, 0L)
    }.getMessage should include("sealed compaction floor")
    ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.getAs[Long]("seq_id")).sorted shouldBe Seq(1L, 3L)
  }

  test("MaintenancePlanner.SweepSpec: the nightly GC in the closed loop " +
      "— the metric IS the dry sweep's count, execute runs the acting " +
      "sweep, the post sweep measures clean") {
    import graft.streaming.MaintenancePlanner
    val root = tmp("gcloop")
    val knn = s"$root/knn"
    val cdf = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cid", "c")
    AnnIndexMaintainer.persistCentroids(spark, knn, 0L, cdf)
    AnnIndexMaintainer.persistCentroids(spark, knn, 2L, cdf)
    val tok = s"$root/tok"
    Retention.setMergesPolicy(tok, 1)
    Seq(Seq("aaab aaab aaab", "aab aab"), Seq("ccd ccd ccd ccd"))
      .zipWithIndex.foreach { case (w, g) =>
        BpeMaintainer.processBatch(corpusDf(w, 10L * g), g.toLong,
          "doc_id", "text", s"$root/tokstate", tok, cfg0)
      }
    val (table, _) = MaintenancePlanner.execute(spark,
      Seq(MaintenancePlanner.SweepSpec("gc", root, 1.0)))
    val rows = table.collect().map(r => (r.getString(0), r.getString(2),
      r.getDouble(3), r.getString(5))).sortBy(_._1).toSeq
    // qg0 + v0 droppable pre; clean post
    rows shouldBe Seq(("post", "stale_generations", 0.0, "none"),
      ("pre", "stale_generations", 2.0, "vacuum"))
    Retention.sweep(spark, root, dryRun = true).count() shouldBe 0L
  }
}
