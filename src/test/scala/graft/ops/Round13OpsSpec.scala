package graft.ops

import graft.SparkSpec
import graft.streaming.{AnnIndexMaintainer, CurateMaintainer,
  SearchIndexMaintainer, ShardMaintainer}
import org.apache.spark.sql.functions._

/** Specs for the round-13 additions: batch-versioned shard tombstones
  * (resurrection + replay safety + the sealed-history error contract),
  * as-of reads for the postings and ANN indexes, drift-triggered
  * re-curation, and the manifest-diff / decontamination hardening.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------ tombstone resurrection

  private def shardSeqs(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("seq_id").as[Long].collect().toSet

  test("reconcile resurrects a de-selected-then-re-selected seq under a new ord") {
    val dir = java.nio.file.Files.createTempDirectory("resur").toString
    val s0 = Seq((1L, "1:2", 2L), (2L, "3", 1L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(s0, 0L, epochs = 1, shardSize = 2, dir)
    // batch 1 drops seq 2
    ShardMaintainer.reconcile(s0.where(col("seq_id") === 1L), 1L, 1, 2, dir)
    shardSeqs(ShardMaintainer.readShardsLive(spark, dir)) shouldBe Set(1L)
    // batch 2 re-selects seq 2 — must come back, under a NEW ord
    ShardMaintainer.reconcile(s0, 2L, 1, 2, dir)
    val live = ShardMaintainer.readShardsLive(spark, dir)
      .select("seq_id", "ord").as[(Long, Long)].collect().toMap
    live.keySet shouldBe Set(1L, 2L)
    // seq 2's original ord is a hole; its resurrected ord appends at base=2
    live(2L) shouldBe 2L
    // the pre-tombstone row stays dead: only one live row per seq
    ShardMaintainer.readShardsLive(spark, dir).count() shouldBe 2L
    // history: as-of 1 still shows the de-selected state
    shardSeqs(ShardMaintainer.readShardsAsOf(spark, dir, 1L)) shouldBe Set(1L)
    shardSeqs(ShardMaintainer.readShardsAsOf(spark, dir, 2L)) shouldBe Set(1L, 2L)
  }

  test("reconcile replay rewrites identical content even after its own writes landed") {
    val dir = java.nio.file.Files.createTempDirectory("replay").toString
    val s0 = Seq((1L, "1:2", 2L), (2L, "3", 1L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(s0, 0L, epochs = 1, shardSize = 2, dir)
    val s1 = Seq((1L, "1:2", 2L), (3L, "4:5", 2L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(s1, 1L, 1, 2, dir)
    val before = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    // crash-replay of batch 1: its data rows AND tombstone sidecar are
    // already on disk; live-ness must be computed from state strictly
    // before the batch, so the replay recomputes the identical delta
    ShardMaintainer.reconcile(s1, 1L, 1, 2, dir)
    val after = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    after shouldBe before
  }

  test("as-of below the sealed compaction floor fails explicitly; at the floor answers") {
    val dir = java.nio.file.Files.createTempDirectory("seal").toString
    val s0 = Seq((1L, "1:2", 2L), (2L, "3", 1L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(s0, 0L, epochs = 1, shardSize = 2, dir)
    ShardMaintainer.reconcile(s0.where(col("seq_id") === 1L), 1L, 1, 2, dir)
    ShardMaintainer.compactTombstones(spark, dir, upTo = 1L)
    ShardMaintainer.sealedHorizon(dir) shouldBe 1L
    val e = intercept[IllegalArgumentException] {
      ShardMaintainer.readShardsAsOf(spark, dir, 0L).count()
    }
    e.getMessage should include("sealed compaction floor")
    shardSeqs(ShardMaintainer.readShardsAsOf(spark, dir, 1L)) shouldBe Set(1L)
  }

  test("compaction preserves a resurrected row and keeps serving it") {
    val dir = java.nio.file.Files.createTempDirectory("rescmp").toString
    val s0 = Seq((1L, "1:2", 2L), (2L, "3", 1L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(s0, 0L, epochs = 1, shardSize = 2, dir)
    ShardMaintainer.reconcile(s0.where(col("seq_id") === 1L), 1L, 1, 2, dir)
    ShardMaintainer.reconcile(s0, 2L, 1, 2, dir) // resurrect seq 2
    val before = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    ShardMaintainer.compactTombstones(spark, dir, upTo = 2L)
    val after = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    after shouldBe before
    // the dead pre-tombstone row is physically gone, the resurrection kept
    ShardMaintainer.readShards(spark, dir).count() shouldBe 2L
  }

  // ----------------------------------------------- index as-of reads

  test("SearchIndexMaintainer.searchAsOf reproduces the historical ranking through a full fold") {
    val dir = java.nio.file.Files.createTempDirectory("bm25asof").toString
    val w0 = Seq((1L, "spark joins data"), (2L, "vector merge spark"))
      .toDF("doc_id", "text")
    val w1 = Seq((3L, "spark spark spark vector")).toDF("doc_id", "text")
    SearchIndexMaintainer.processBatch(w0, 0L, "doc_id", "text", dir)
    SearchIndexMaintainer.processBatch(w1, 1L, "doc_id", "text", dir)
    SearchIndexMaintainer.compact(spark, "doc_id", dir, Some(1L))
    val asOf = SearchIndexMaintainer.searchAsOf(spark, dir, "doc_id",
      Seq("spark", "vector"), k = 5, asOf = 0L)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = TfIdf.bm25Search(w0, "doc_id", "text",
      Seq("spark", "vector"), k = 5)
      .collect().map(_.toString).sorted.toSeq
    asOf shouldBe oneShot
  }

  test("lengths sidecar + delta re-collapses a doc id that straddles the fold horizon") {
    val dir = java.nio.file.Files.createTempDirectory("lenfold").toString
    // same doc id ingested in a folded batch AND a later delta batch
    SearchIndexMaintainer.processBatch(
      Seq((1L, "spark data"), (2L, "vector")).toDF("doc_id", "text"),
      0L, "doc_id", "text", dir)
    SearchIndexMaintainer.processBatch(
      Seq((1L, "spark merge")).toDF("doc_id", "text"),
      1L, "doc_id", "text", dir)
    SearchIndexMaintainer.compact(spark, "doc_id", dir, Some(0L))
    val dl = SearchIndexMaintainer.lengthsFromState(spark, "doc_id", dir).get
    // one row per doc, doc 1's length = both batches' tokens
    dl.orderBy("doc_id").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 4L), (2L, 1L))
    // and the sidecar-served search equals the postings-only derivation
    val served = SearchIndexMaintainer.search(spark, dir, "doc_id",
      Seq("spark"), k = 5).collect().map(_.toString).sorted.toSeq
    val plain = TfIdf.bm25FromPostings(
      SearchIndexMaintainer.readPostings(spark, "doc_id", dir),
      "doc_id", Seq("spark"), k = 5)
      .collect().map(_.toString).sorted.toSeq
    served shouldBe plain
  }

  test("AnnIndexMaintainer.searchAsOf equals the one-shot scan over the prefix corpus") {
    val dir = java.nio.file.Files.createTempDirectory("annasof").toString
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.1, 0.9)), (4L, Seq(0.7, 0.3)), (5L, Seq(0.3, 0.7)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    AnnIndexMaintainer.processBatch(vecs.where(col("vec_id") < 4), 0L,
      "vec_id", "embedding", cents, dir)
    AnnIndexMaintainer.processBatch(vecs.where(col("vec_id") >= 4), 1L,
      "vec_id", "embedding", cents, dir)
    AnnIndexMaintainer.compact(spark, dir, Some(1L))
    val q = Seq((0L, Array(1.0, 0.0)))
    val asOf = AnnIndexMaintainer.searchAsOf(spark, dir, cents, q, k = 3,
      asOf = 0L, rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val oneShot = Ann.ivfTopK(vecs.where(col("vec_id") < 4),
      vecs.where(col("vec_id") === 0L), "vec_id", "embedding", k = 3,
      centroidsOpt = Some(cents), rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    asOf shouldBe oneShot
  }

  // ------------------------------------------ drift-triggered curate

  test("klTotal: zero for identical counts, positive and ordered for a shifted distribution") {
    val a = Seq(("x", 10L), ("y", 10L)).toDF("word", "freq")
    Corpus.klTotal(a, a) shouldBe 0.0 +- 1e-12
    val shifted = Seq(("x", 10L), ("y", 10L), ("z", 40L)).toDF("word", "freq")
    val small = Seq(("x", 11L), ("y", 10L)).toDF("word", "freq")
    Corpus.klTotal(a, shifted) should be > Corpus.klTotal(a, small)
    Corpus.klTotal(a, shifted) should be > 0.1
  }

  test("drift trigger: first batch derives, low-drift batch holds, shifted batch re-derives") {
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    // long plain docs that pass the gopher gate (25..90 words)
    def doc(id: Long, extra: String) = (id,
      ("the data pipeline writes a value of row item " * 4).trim + " " + extra)
    val w0 = Seq(doc(0L, "alpha beta"), doc(3L, "gamma delta"))
      .toDF("doc_id", "text")
    val w1 = Seq(doc(1L, "alpha gamma"), doc(4L, "beta delta"))
      .toDF("doc_id", "text")
    val w2 = Seq(doc(2L, ("zz " * 30).trim), doc(5L, ("qq " * 30).trim))
      .toDF("doc_id", "text")
    CurateMaintainer.processBatchDriftTriggered(w0, w0, 0L, "doc_id",
      "text", 30, dir, klThreshold = 0.05) shouldBe true
    val sel0 = CurateMaintainer.currentSelection(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    CurateMaintainer.processBatchDriftTriggered(w1, w0.unionByName(w1), 1L,
      "doc_id", "text", 30, dir, klThreshold = 0.05) shouldBe false
    // held: the served selection is still batch 0's
    CurateMaintainer.currentSelection(spark, dir)
      .collect().map(_.toString).sorted.toSeq shouldBe sel0
    CurateMaintainer.selectionBaseline(dir) shouldBe 0L
    val all = w0.unionByName(w1).unionByName(w2)
    CurateMaintainer.processBatchDriftTriggered(w2, all, 2L, "doc_id",
      "text", 30, dir, klThreshold = 0.05) shouldBe true
    CurateMaintainer.selectionBaseline(dir) shouldBe 2L
  }

  // --------------------------------------------------- hardening

  test("manifestDiff keys status on row presence, not value nullness") {
    val o = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("doc_id", "v")
    val n = Seq((2L, Some(20L)), (3L, None), (4L, None)).toDF("doc_id", "v")
    val out = Corpus.manifestDiff(o, n, "doc_id", "v")
      .select("doc_id", "status", "changed")
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, "removed", true),
      (2L, "kept", true),   // NULL -> 20: kept, changed
      (3L, "kept", true),   // 30 -> NULL: kept, changed
      (4L, "added", true))
  }

  test("bm25Decontaminate raises on a provenance-key overflow instead of misattributing") {
    val corpus = Seq((Long.MaxValue / 100000L + 7L,
      "spark vector merge data row value")).toDF("doc_id", "text")
    val evalDocs = Seq((1L, "spark vector")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Corpus.bm25Decontaminate(corpus, evalDocs, "doc_id", "text",
        width = 3, stride = 2).collect()
    }
    e.getMessage should include("provenance key overflow")
  }
}
