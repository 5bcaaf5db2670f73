package graft.ops

import graft.SparkSpec
import graft.streaming.{AnnIndexMaintainer, CurateMaintainer,
  MaintenancePlanner, SearchIndexMaintainer, ShardMaintainer}
import graft.streaming.MaintenancePlanner.{AnnSpec, CurateRun, CurateSpec,
  DeltaSpec, ShardSpec}
import org.apache.spark.sql.functions._

/** Specs for the round-16 additions: versioned curation selections
  * (time-travel + crash-atomic generations), the retrain safety guards,
  * the ridge-head ragged-input guard, and the sidecar-derived shard
  * liveness metrics.
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ------------------------------------- versioned curation selection

  // passes every gopher rule: 26 words, ~0.96 unique fraction, alpha
  // tokens, several stopwords
  private def doc(id: Long, extra: String) = (id,
    "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch quietly from the tall grass near slowly running water today " +
      extra)

  test("selectionAsOf: every firing is an append-only generation; " +
      "historical horizons re-read from current files; pre-first-firing " +
      "horizons throw") {
    val dir = tmp("selasof")
    // ids 6/9/11/17 sit in the LM's md5 train split (first hex < '8'),
    // so the ppl stage scores against a non-empty model
    val w0 = Seq(doc(6L, "alpha beta"), doc(9L, "gamma delta"))
      .toDF("doc_id", "text")
    val w1 = Seq(doc(11L, "alpha gamma"), doc(17L, "beta delta"))
      .toDF("doc_id", "text")
    val w2 = Seq(doc(2L, ("zz " * 30).trim), doc(5L, ("qq " * 30).trim))
      .toDF("doc_id", "text")
    CurateMaintainer.processBatchDriftTriggered(w0, w0, 0L, "doc_id",
      "text", 30, dir, klThreshold = 0.05,
      pplKeepBelow = 1000.0) shouldBe true
    val sel0 = CurateMaintainer.currentSelection(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    sel0 should not be empty
    CurateMaintainer.processBatchDriftTriggered(w1, w0.unionByName(w1), 1L,
      "doc_id", "text", 30, dir, klThreshold = 0.05,
      pplKeepBelow = 1000.0) shouldBe false
    val all = w0.unionByName(w1).unionByName(w2)
    CurateMaintainer.processBatchDriftTriggered(w2, all, 2L, "doc_id",
      "text", 30, dir, klThreshold = 0.05,
      pplKeepBelow = 1000.0) shouldBe true
    val sel2 = CurateMaintainer.currentSelection(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    sel2 should not be sel0
    // as-of 0 and 1 both resolve to the wave-0 generation (no firing at 1)
    CurateMaintainer.selectionAsOf(spark, dir, 0L)
      .collect().map(_.toString).sorted.toSeq shouldBe sel0
    CurateMaintainer.selectionAsOf(spark, dir, 1L)
      .collect().map(_.toString).sorted.toSeq shouldBe sel0
    CurateMaintainer.selectionAsOf(spark, dir, 2L)
      .collect().map(_.toString).sorted.toSeq shouldBe sel2
    // before the first firing there was nothing being served
    val e = intercept[IllegalArgumentException] {
      CurateMaintainer.selectionAsOf(spark, dir, -1L)
    }
    e.getMessage should include("no selection generation")
    // a stray crash-leftover temp dir is never picked up as a generation
    new java.io.File(s"$dir/selection", ".s9.tmp").mkdirs()
    CurateMaintainer.currentSelection(spark, dir)
      .collect().map(_.toString).sorted.toSeq shouldBe sel2
  }

  // ------------------------------------------------- retrain guards

  test("retrain refuses the live index dir as its target and refuses an " +
      "empty state, before deleting anything") {
    val dir = tmp("retrg")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    AnnIndexMaintainer.processBatch(vecs, 0L, "vec_id", "embedding",
      cents, dir)
    val same = intercept[IllegalArgumentException] {
      AnnIndexMaintainer.retrain(spark, dir, dir + "/../" +
        new java.io.File(dir).getName)
    }
    same.getMessage should include("new generation")
    // the live index must be untouched by the refused call
    AnnIndexMaintainer.readIndex(spark, dir).count() shouldBe 2L
    val empty = intercept[IllegalArgumentException] {
      AnnIndexMaintainer.retrain(spark, tmp("retrempty"), tmp("retrnew"))
    }
    empty.getMessage should include("nothing to rebuild")
  }

  // --------------------------------------------- ridge head hardening

  test("ridgeHead fails fast with a clear message on ragged vectors") {
    val ragged = Seq((Seq(1.0, 2.0), 0), (Seq(1.0, 2.0, 3.0), 1))
      .toDF("v", "label")
    val e = intercept[org.apache.spark.SparkException] {
      Tower.ridgeHead(ragged, "v", "label")
    }
    e.getMessage should include("non-uniform vector length")
  }

  // ------------------------------------------- maintenance executor

  test("execute: applies every non-none decision with the state's own " +
      "maintainer op, second sweep reports all-none, live views survive " +
      "bit-identical") {
    // ANN arm: monitored drift state whose wave 1 is far off the
    // bootstrap quantizer
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def vecs(ids: Seq[Long], shift: Double = 0.0) =
      ids.map(i => (i, Seq(
        (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * (i % 3) + shift,
        (if (i % 2 == 0) 0.0 else 1.0) + shift)))
        .toDF("vec_id", "embedding")
    val ann = tmp("execann")
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, ann)
    AnnIndexMaintainer.markTrained(ann, 0L)
    AnnIndexMaintainer.processBatchMonitored(vecs(10L to 19L, shift = 5.0),
      1L, "vec_id", "embedding", cents, ann)
    // shard arm: a reconcile history with dead mass
    val sh = tmp("execsh")
    val rows = Seq((0L, "1:2", 2L), (1L, "3:4", 2L), (2L, "5:6", 2L),
      (3L, "7:8", 2L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(rows, 0L, epochs = 1, shardSize = 2, sh)
    ShardMaintainer.reconcile(rows.where(col("seq_id") =!= 0L), 1L,
      epochs = 1, shardSize = 2, sh)
    val liveBefore = ShardMaintainer.readShardsLive(spark, sh)
      .collect().map(_.toString).sorted.toSeq
    // delta arm: postings with an un-folded majority
    val post = tmp("execpost")
    val dd = Seq((0L, "alpha beta"), (1L, "alpha gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    (0 until 3).foreach { g =>
      SearchIndexMaintainer.processBatch(dd.where(col("doc_id") === g),
        g.toLong, "doc_id", "text", post)
    }
    // curate arm: asleep inline trigger (fires only at wave 0), wave 2
    // shifts the distribution
    val cur = tmp("execcur")
    val w0 = Seq(doc(6L, "alpha beta")).toDF("doc_id", "text")
    val w1 = Seq(doc(9L, "gamma delta")).toDF("doc_id", "text")
    val w2 = Seq(doc(11L, ("drift " * 40).trim)).toDF("doc_id", "text")
    var ingested = w0
    CurateMaintainer.processBatchDriftTriggered(w0, ingested, 0L, "doc_id",
      "text", 30, cur, klThreshold = 1e9, pplKeepBelow = 1000.0)
    ingested = ingested.unionByName(w1)
    CurateMaintainer.processBatchDriftTriggered(w1, ingested, 1L, "doc_id",
      "text", 30, cur, klThreshold = 1e9, pplKeepBelow = 1000.0)
    ingested = ingested.unionByName(w2)
    CurateMaintainer.processBatchDriftTriggered(w2, ingested, 2L, "doc_id",
      "text", 30, cur, klThreshold = 1e9, pplKeepBelow = 1000.0)
    CurateMaintainer.selectionBaseline(cur) shouldBe 0L
    val specs = Seq(
      AnnSpec("idx", ann, 4.0),
      ShardSpec("sh", sh, 0.2),
      DeltaSpec("post", post, 0.4),
      CurateSpec("cur", cur, 0.05))
    // a retrain decision without a target dir is an explicit error
    intercept[IllegalArgumentException] {
      MaintenancePlanner.execute(spark, specs)
    }.getMessage should include("annNewDirs")
    val gen2 = tmp("execann2") + "/gen2"
    val (table, postSpecs) = MaintenancePlanner.execute(spark, specs,
      annNewDirs = Map("idx" -> gen2),
      curateRuns = Map("cur" ->
        CurateRun(ingested, "doc_id", "text", 30, pplKeepBelow = 1000.0)),
      deltaCompactors = Map("post" -> ((sp, dir) =>
        SearchIndexMaintainer.compact(sp, "doc_id", dir, Some(2L)))))
    val rowsOut = table.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(5)).toMap
    rowsOut(("pre", "idx")) shouldBe "retrain"
    rowsOut(("pre", "sh")) shouldBe "compact"
    rowsOut(("pre", "post")) shouldBe "compact"
    rowsOut(("pre", "cur")) shouldBe "recurate"
    Seq("idx", "sh", "post", "cur").foreach { n =>
      rowsOut(("post", n)) shouldBe "none"
    }
    // acted-on states measure healthy; a fresh sweep over the post specs
    // stays all-none (the fixed point)
    MaintenancePlanner.plan(spark, postSpecs).collect()
      .map(_.getString(4)).toSeq shouldBe Seq.fill(4)("none")
    // shard live view bit-identical through the compaction
    ShardMaintainer.readShardsLive(spark, sh)
      .collect().map(_.toString).sorted.toSeq shouldBe liveBefore
    // the retrained generation serves the full corpus under its
    // persisted centroids and starts a fresh baseline
    val cents2 = graft.ops.Ann.ivfCentroidsFromDf(
      spark.read.parquet(s"$gen2/cents"))
    AnnIndexMaintainer.readIndex(spark, gen2).count() shouldBe 20L
    AnnIndexMaintainer.driftRatio(spark, gen2) shouldBe None
    cents2.length should be >= 2
    // the re-derived selection is the one-shot curate over everything
    // ingested, served as the newest generation
    val sel = CurateMaintainer.currentSelection(spark, cur)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = CurateMaintainer.curated(ingested, "doc_id", "text",
        s"$cur/cur", 30, pplKeepBelow = 1000.0)
      .collect().map(_.toString).sorted.toSeq
    sel shouldBe oneShot
    CurateMaintainer.selectionBaseline(cur) shouldBe 2L
  }

  // --------------------------------------- incremental quantizer growth

  test("grow: union assignment exact vs a from-scratch scan, time travel " +
      "intact through the growth, drift measures healthy after") {
    val dir = tmp("grow")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def vecs(ids: Seq[Long], shift: Double = 0.0) =
      ids.map(i => (i, Seq(
        (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * (i % 3) + shift,
        (if (i % 2 == 0) 0.0 else 1.0) + shift)))
        .toDF("vec_id", "embedding")
    val w0 = vecs(0L to 9L)
    val w1 = vecs(10L to 19L, shift = 5.0)
    AnnIndexMaintainer.processBatchMonitored(w0, 0L, "vec_id", "embedding",
      cents, dir)
    AnnIndexMaintainer.markTrained(dir, 0L)
    AnnIndexMaintainer.processBatchMonitored(w1, 1L, "vec_id", "embedding",
      cents, dir)
    AnnIndexMaintainer.shouldRetrain(spark, dir, 4.0) shouldBe true
    val grown = AnnIndexMaintainer.grow(spark, dir, cents, kNew = 2,
      roundScale = 6)
    val cents1 = graft.ops.Ann.ivfCentroidsFromDf(grown)
    cents1.length shouldBe 4
    cents1.take(2).map(_.toSeq) shouldBe cents.map(_.toSeq) // old cids keep
    // every shifted row re-homed into a grown cell, originals untouched
    val all = w0.unionByName(w1)
    val qids = Seq(0L, 1L, 10L, 11L)
    val queries = all.where(col("vec_id").isin(qids: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val served = AnnIndexMaintainer.search(spark, dir, cents1, queries,
        k = 3, rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted.toSeq
    val oneShot = graft.ops.Ann.ivfTopK(all,
        all.where(col("vec_id").isin(qids: _*)), "vec_id", "embedding",
        k = 3, centroidsOpt = Some(cents1), rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted.toSeq
    served shouldBe oneShot
    // time travel below the growth: the ORIGINAL assignment answers
    val asOf0 = AnnIndexMaintainer.searchAsOf(spark, dir, cents,
        queries.take(2), k = 3, asOf = 0L, rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted.toSeq
    val w0Only = graft.ops.Ann.ivfTopK(w0,
        w0.where(col("vec_id") < 2), "vec_id", "embedding", k = 3,
        centroidsOpt = Some(cents), rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted.toSeq
    asOf0 shouldBe w0Only
    // the remedy resets the drift signal: fresh baseline, nothing after
    AnnIndexMaintainer.driftRatio(spark, dir) shouldBe None
    AnnIndexMaintainer.shouldRetrain(spark, dir, 4.0) shouldBe false
    // growth without a drifted tail is an explicit error
    intercept[IllegalArgumentException] {
      AnnIndexMaintainer.grow(spark, dir, cents1, kNew = 2)
    }.getMessage should include("no post-baseline rows")
  }

  // ----------------------------------------- cost-aware remedy choice

  test("annRemedy: grow for a small drifted tail, retrain for a drifted " +
      "majority, none when the trigger holds — all from the sidecar") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def vecs(ids: Seq[Long], shift: Double = 0.0) =
      ids.map(i => (i, Seq(
        (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * (i % 3) + shift,
        (if (i % 2 == 0) 0.0 else 1.0) + shift)))
        .toDF("vec_id", "embedding")
    // tail case: 10 baseline rows, 2 shifted post rows → pf 1/6
    val tail = tmp("remtail")
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, tail)
    AnnIndexMaintainer.markTrained(tail, 0L)
    AnnIndexMaintainer.processBatchMonitored(vecs(10L to 11L, shift = 5.0),
      1L, "vec_id", "embedding", cents, tail)
    AnnIndexMaintainer.postFraction(spark, tail).get shouldBe
      (2.0 / 12.0) +- 1e-12
    MaintenancePlanner.annRemedy(spark, tail, 4.0) shouldBe "grow"
    // majority case: 2 baseline rows, 10 shifted → pf 5/6
    val maj = tmp("remmaj")
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 1L), 0L, "vec_id",
      "embedding", cents, maj)
    AnnIndexMaintainer.markTrained(maj, 0L)
    AnnIndexMaintainer.processBatchMonitored(vecs(2L to 11L, shift = 5.0),
      1L, "vec_id", "embedding", cents, maj)
    MaintenancePlanner.annRemedy(spark, maj, 4.0) shouldBe "retrain"
    // no drift → none regardless of fractions
    val hold = tmp("remhold")
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, hold)
    AnnIndexMaintainer.markTrained(hold, 0L)
    AnnIndexMaintainer.processBatchMonitored(vecs(10L to 11L), 1L,
      "vec_id", "embedding", cents, hold)
    MaintenancePlanner.annRemedy(spark, hold, 4.0) shouldBe "none"
    // before a baseline the signals are None (no spurious remedy)
    val fresh = tmp("remfresh")
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 3L), 0L, "vec_id",
      "embedding", cents, fresh)
    AnnIndexMaintainer.postFraction(spark, fresh) shouldBe None
    MaintenancePlanner.annRemedy(spark, fresh, 4.0) shouldBe "none"
  }

  // ------------------------------------- cross-state snapshot manifest

  test("SnapshotManifest: pin validates at pin time, reads dispatch to " +
      "each state's as-of, verify catches a later seal") {
    import graft.streaming.SnapshotManifest
    import graft.streaming.SnapshotManifest.Pin
    val sh = tmp("snapsh")
    def payload(ids: Seq[Long]) =
      ids.map(i => (i, s"ids$i", 4L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(payload(Seq(0L, 1L, 2L, 3L)), 0L,
      epochs = 1, shardSize = 2, sh)
    ShardMaintainer.reconcile(payload(Seq(0L, 1L)), 1L,
      epochs = 1, shardSize = 2, sh)
    val post = tmp("snappost")
    val dd = Seq((0L, "alpha beta"), (1L, "alpha gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    (0 until 3).foreach { g =>
      SearchIndexMaintainer.processBatch(dd.where(col("doc_id") === g),
        g.toLong, "doc_id", "text", post)
    }
    val ann = tmp("snapann")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = (0L to 5L).map(i => (i, Seq(
      if (i % 2 == 0) 1.0 else 0.0, if (i % 2 == 0) 0.0 else 1.0)))
      .toDF("vec_id", "embedding")
    (0 until 2).foreach { g =>
      AnnIndexMaintainer.processBatch(
        vecs.where(col("vec_id") % 2 === g), g.toLong, "vec_id",
        "embedding", cents, ann)
    }
    val mdir = tmp("snapman") + "/m"
    // a horizon before a curate state's first firing fails the PIN
    val curEmpty = tmp("snapcur")
    intercept[IllegalArgumentException] {
      SnapshotManifest.pin(spark, Seq(
        Pin("sel", "curate", curEmpty, 0L)), mdir)
    }.getMessage should include("no selection generation")
    SnapshotManifest.pin(spark, Seq(
      Pin("shards", "shards", sh, 0L),
      Pin("postings", "postings", post, 1L, "doc_id"),
      Pin("vectors", "ann", ann, 0L)), mdir)
    // reads dispatch to the as-of views
    SnapshotManifest.readState(spark, mdir, "shards")
      .collect().map(_.toString).sorted.toSeq shouldBe
      ShardMaintainer.readShardsAsOf(spark, sh, 0L)
        .collect().map(_.toString).sorted.toSeq
    SnapshotManifest.readState(spark, mdir, "postings")
      .select("doc_id").distinct().collect().map(_.getLong(0))
      .toSet shouldBe Set(0L, 1L)
    SnapshotManifest.readState(spark, mdir, "vectors")
      .select("id").collect().map(_.getLong(0)).toSet shouldBe
      Set(0L, 2L, 4L)
    SnapshotManifest.verify(spark, mdir)
      .select("ok").collect().map(_.getBoolean(0)).toSeq shouldBe
      Seq(true, true, true)
    // a later compaction seals history below the pinned shard horizon —
    // verify reports exactly which pin broke and why
    ShardMaintainer.compactTombstones(spark, sh, upTo = 1L)
    val v = SnapshotManifest.verify(spark, mdir).collect()
      .map(r => r.getString(0) -> (r.getBoolean(3), r.getString(4))).toMap
    v("shards")._1 shouldBe false
    v("shards")._2 should include("sealed compaction floor")
    v("postings")._1 shouldBe true
    v("vectors")._1 shouldBe true
    // duplicate names and unknown kinds fail fast
    intercept[IllegalArgumentException] {
      SnapshotManifest.pin(spark, Seq(
        Pin("a", "ann", ann, 0L), Pin("a", "ann", ann, 1L)), tmp("dup"))
    }
    intercept[IllegalArgumentException] {
      SnapshotManifest.pin(spark, Seq(Pin("x", "nope", ann, 0L)), tmp("uk"))
    }
  }

  // -------------------------------- sidecar-derived shard liveness

  test("deadFraction derives from append/tombstone sidecars and matches " +
      "the reconcile history; compaction drops it back toward zero") {
    val dir = tmp("shardside")
    def payload(ids: Seq[Long]) =
      ids.map(i => (i, s"ids$i", 4L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(payload(Seq(0L, 1L, 2L, 3L)), 0L,
      epochs = 1, shardSize = 2, dir)
    ShardMaintainer.deadFraction(spark, dir) shouldBe 0.0
    // drop half the selection
    ShardMaintainer.reconcile(payload(Seq(0L, 1L)), 1L,
      epochs = 1, shardSize = 2, dir)
    ShardMaintainer.deadFraction(spark, dir) shouldBe 0.5 +- 1e-12
    // a resurrection re-appends under a new batch and revives liveness
    ShardMaintainer.reconcile(payload(Seq(0L, 1L, 2L)), 2L,
      epochs = 1, shardSize = 2, dir)
    ShardMaintainer.deadFraction(spark, dir) shouldBe 0.25 +- 1e-12
    val liveBefore = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    ShardMaintainer.compactTombstones(spark, dir, upTo = 2L)
    // live view bit-identical, dead mass physically gone
    ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq shouldBe liveBefore
    ShardMaintainer.deadFraction(spark, dir) shouldBe 0.0
  }
}
