package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-8 operators: PQ-coded SemDeDup, composed IVF-PQ
  * search, and the scale refinements of the streaming/byte-BPE surfaces.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

  // ---------------------------------------------------------- semdedup-pq

  test("semDedupPq with an all-pass screen == exact semDedup") {
    // margin ≥ 1 + tau makes the SDC screen admit every within-cell pair
    // (cos ≥ tau − margin ≤ −1 always holds), so the exact rerank is the
    // whole predicate and the kept set must equal the uncoded operator's.
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    val exact = Ann.semDedup(embeddings, "vec_id", "embedding", cents, 0.3)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val pq = Ann.semDedupPq(embeddings, "vec_id", "embedding", cents, cb,
      tau = 0.3, margin = 2.0)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    pq shouldBe exact
  }

  test("semDedupPq: screened kept set ⊇ exact kept set; near-full drop recall at default margin") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    val exactKept = Ann.semDedup(embeddings, "vec_id", "embedding", cents, 0.3)
      .select("vec_id").as[Long].collect().toSet
    val pqKept = Ann.semDedupPq(embeddings, "vec_id", "embedding", cents, cb,
      tau = 0.3, margin = 0.2)
      .select("vec_id").as[Long].collect().toSet
    // the screen can only MISS a drop, never invent one
    assert(exactKept.subsetOf(pqKept),
      s"PQ screen dropped rows the exact op kept: ${exactKept -- pqKept}")
    val total = embeddings.count()
    val exactDrops = total - exactKept.size
    val pqDrops = total - pqKept.size
    assert(exactDrops > 0, "fixture has no drops — test is vacuous")
    // these embeddings are RANDOM 64-dim vectors — PQ's worst case (no
    // low-dimensional manifold to learn); 0.2 margin still recovers ≥85%
    // of drops here, and production tau ≈ 0.95 screens at 0.75
    assert(pqDrops * 100 >= exactDrops * 85,
      s"PQ drop recall too low: $pqDrops/$exactDrops")
  }

  // ------------------------------------------------------------- ivf-pq

  test("ivfPqTopK: probing all cells degenerates to pqTopK exactly") {
    val qs = embeddings.where(col("vec_id") < 5)
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 16))
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    val full = Ann.ivfPqTopK(embeddings, qs, "vec_id", "embedding", k = 10,
      cents, cb, nprobe = 16, rerank = 4, rankOnRoundedTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pq = Ann.pqTopK(embeddings, qs, "vec_id", "embedding", k = 10,
      codebooksOpt = Some(cb), rankOnRoundedTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    full shouldBe pq
  }

  test("ivfPqTopK: recall vs brute above floor at nprobe=4") {
    val qs = embeddings.where(col("vec_id") < 5)
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 16))
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    val brute = Ann.bruteTopK(embeddings, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Ann.ivfPqTopK(embeddings, qs, "vec_id", "embedding", k = 10,
      cents, cb, nprobe = 4, rerank = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.size shouldBe 50
    assert(got.intersect(brute).size >= 20, // cell pruning × code loss
      s"IVF-PQ recall ${got.intersect(brute).size}/50")
  }

  test("streaming PQ inverted file: searchPq == one-shot ivfPqTopK; replay idempotent; fold invariant") {
    import graft.streaming.{AnnIndexMaintainer => AIM}
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 16))
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpq-s")
      .toString
    val idx = s"$base/index"
    (0 until 3).foreach { g =>
      AIM.processBatchPq(embeddings.where(col("vec_id") % 3 === g), g.toLong,
        "vec_id", "embedding", cents, cb, idx, roundScale = 6)
    }
    val queries = embeddings.where(col("vec_id") < 5)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    def run() = AIM.searchPq(spark, idx, cents, cb, queries, k = 10,
        rankOnRoundedTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = run()
    val oneShot = Ann.ivfPqTopK(embeddings,
        embeddings.where(col("vec_id") < 5), "vec_id", "embedding", k = 10,
        cents, cb, rankOnRoundedTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    streamed shouldBe oneShot
    // crash-replay of the newest batch rewrites its dir byte-identically
    AIM.processBatchPq(embeddings.where(col("vec_id") % 3 === 2), 2L,
      "vec_id", "embedding", cents, cb, idx, roundScale = 6)
    run() shouldBe oneShot
    // LSM fold must not change any search result
    AIM.compactPq(spark, idx)
    run() shouldBe oneShot
  }

  // ------------------------------------------------------ curate, BPE unit

  test("curate with a BPE budget == hand-staged composition of the gated blocks") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 40)
    val got = Corpus.curate(docs, "doc_id", "text",
        bpeMerges = Some(merges))
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    val audit = TextOps.gopherAudit(docs, "doc_id", "text", minStopwords = 1)
    val passed = docs
      .join(audit.where(col("fail_mask") === 0).select("doc_id"), Seq("doc_id"))
    val reps = Dedup.exact(passed, Seq("text"), "doc_id").select("doc_id")
    val surv = passed.join(reps, Seq("doc_id"), "semi")
    val cleaned = Dedup.removeSpans(surv, "doc_id", "text", 30)
    val scored = LangModel.perplexityScore(cleaned, "doc_id", "clean_text", 3.43)
    val toks = Bpe.docTokenCounts(cleaned, "doc_id", "clean_text", merges)
    val withTok = cleaned
      .join(scored.where(col("kept"))
        .select(col("id").as("doc_id"), col("avg_nll")), Seq("doc_id"))
      .join(toks, Seq("doc_id"))
    val staged = Corpus.selectWithinBudget(
        withTok.withColumn("__q", -col("avg_nll")),
        "doc_id", "n_bpe_tok", "__q", 6000L)
      .join(withTok.select(col("doc_id"),
        col("n_bpe_tok").cast("long").as("n_tok"), col("avg_nll")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("avg_nll"),
        col("cum_tok").cast("long").as("cum_tok"))
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    got shouldBe staged
    assert(got.nonEmpty)
  }

  // ------------------------------------------- substring index key sidecar

  test("substring-index compaction writes a key-count sidecar; spans identical with or without it") {
    import graft.streaming.{SubstrIndexMaintainer => SIM}
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-substr-kc")
      .toString
    val indexDir = s"$base/index"
    (0 until 3).foreach { g =>
      SIM.processBatch(docs.where(col("doc_id") % 3 === g), g.toLong,
        "doc_id", "text", 30, indexDir)
    }
    SIM.compact(spark, indexDir) // folds b0,b1 into c1 + writes kc1
    val kc = new java.io.File(indexDir, "kc1")
    assert(kc.exists(), "sidecar kc1 missing after compact")
    val withSidecar = SIM.spans(spark, indexDir, 30)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // crash-window fallback: a segment without its sidecar recounts
    graft.Exec.deletePath(kc.getPath)
    val recounted = SIM.spans(spark, indexDir, 30)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    withSidecar shouldBe recounted
    // and both equal the one-shot span derivation over everything ingested
    val oneShot = Dedup.duplicateSpans(docs, "doc_id", "text", 30)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    withSidecar shouldBe oneShot
    // re-compacting after more batches supersedes the old sidecar
    SIM.processBatch(docs.where(col("doc_id") % 3 === 0), 3L,
      "doc_id", "text", 30, indexDir) // replayed content, new batch id
    SIM.compact(spark, indexDir, upToOpt = Some(2L))
    assert(new java.io.File(indexDir, "kc2").exists())
    assert(!new java.io.File(indexDir, "kc1").exists(),
      "superseded sidecar not cleaned up")
  }

  test("semDedupPq is layout-independent") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.semDedupPq(df, "vec_id", "embedding", cents, cb, tau = 0.3)
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
    run(embeddings.repartition(17)) shouldBe run(embeddings.coalesce(1))
  }

  // ---------------------------------------------------------- knn graph

  test("nearestCellsNative: head == nearestCellNative; full fan-out is a permutation") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val both = embeddings.select(
      graft.functions.VectorFns.nearestCellNative(
        col("embedding").cast("array<double>"), cents, 6).as("one"),
      graft.functions.VectorFns.nearestCellsNative(
        col("embedding").cast("array<double>"), cents, 6, 3).as("top3"),
      graft.functions.VectorFns.nearestCellsNative(
        col("embedding").cast("array<double>"), cents, 6, 8).as("all8"))
      .collect()
    both.foreach { r =>
      r.getSeq[Int](1).head shouldBe r.getInt(0)
      r.getSeq[Int](1) shouldBe r.getSeq[Int](2).take(3)
      r.getSeq[Int](2).sorted shouldBe (0 until 8)
    }
  }

  test("knnGraph probing all cells == bruteTopK with the corpus as queries") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val g = Ann.knnGraph(embeddings, "vec_id", "embedding", k = 5,
      cents, nprobe = 8, rankOnRoundedTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Ann.bruteTopK(embeddings, embeddings, "vec_id", "embedding",
      k = 5, rankOnRoundedTo = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    g shouldBe b
  }

  test("knnGraph is layout-independent and self-edge-free") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.knnGraph(df, "vec_id", "embedding", k = 5, cents, nprobe = 2,
        rankOnRoundedTo = Some(6))
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    val a = run(embeddings.repartition(17))
    a shouldBe run(embeddings.coalesce(1))
    a.foreach { case (q, n, _) => q should not be n }
  }

  test("epochOrder: per-epoch bijection, epoch-distinct permutations, layout-independent, composes with packed seqs") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.epochOrder(df.select("doc_id"), "doc_id", epochs = 2)
        .as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._3))
    val a = run(docs.repartition(13))
    a shouldBe run(docs.coalesce(1)) // deterministic + layout-independent
    val n = docs.count()
    (1 to 2).foreach { e =>
      val ep = a.filter(_._1 == e)
      ep.map(_._3).toSeq shouldBe (0L until n) // ord is a dense 0-based rank
      ep.map(_._2).distinct.length shouldBe n  // every item exactly once
    }
    // the two epochs draw genuinely different permutations
    a.filter(_._1 == 1).map(_._2).toSeq should not be
      a.filter(_._1 == 2).map(_._2).toSeq
    // composes over packed training sequences (the intended consumer)
    val seqs = Packing.packTokenIds(docs, "doc_id", "text",
      Seq(("t", "h"), ("th", "e")), seqLen = 128).select(col("seq_id"))
    val so = Packing.epochOrder(seqs, "seq_id", epochs = 1)
      .as[(Int, Long, Long)].collect()
    so.map(_._3).sorted.toSeq shouldBe (0L until seqs.count())
  }

  test("trainManifest invariants: token conservation, full sequences, per-epoch bijection") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10)
    val m = Corpus.trainManifest(docs, "doc_id", "text", merges,
      seqLen = 128, epochs = 2)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    val e1 = m.filter(_._1 == 1)
    // token conservation: Σ seq n_tok == Σ selected-doc BPE tokens + EOS/doc
    val sel = Corpus.curateWithText(docs, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
    val expTok = Bpe.docTokenCounts(sel, "doc_id", "text", merges)
      .agg(sum(col("n_bpe_tok"))).collect().head.getLong(0) + sel.count()
    e1.map(_._4).sum shouldBe expTok
    // every sequence full except at most the last
    e1.map(_._4).count(_ != 128L) should be <= 1
    // both epochs cover the same sequence set with a dense 0-based order,
    // in genuinely different permutations
    val e2 = m.filter(_._1 == 2)
    e1.map(_._2).toSet shouldBe e2.map(_._2).toSet
    e1.map(_._3).sorted.toSeq shouldBe (0L until e1.length)
    e1.sortBy(_._3).map(_._2).toSeq should not be
      e2.sortBy(_._3).map(_._2).toSeq
  }

  test("byte-mode trainManifest: token conservation on a mixed-script corpus") {
    val docs = Seq(
      (1L, "the quick brown fox écrit 日本語 every day"),
      (2L, "Привет the quick fox"),
      (3L, "日本語 répète the brown fox")).toDF("doc_id", "text")
    // minQuality gates would drop these tiny docs — drive the tail
    // directly with the full set as the 'selection'
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 6,
      byteLevel = true)
    val m = Corpus.trainManifestFrom(docs, "doc_id", "text", merges,
      seqLen = 16, epochs = 1, byteLevel = true)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    val expTok = Bpe.docTokenCounts(docs, "doc_id", "text", merges,
        byteLevel = true)
      .agg(sum(col("n_bpe_tok"))).collect().head.getLong(0) + docs.count()
    m.map(_._4).sum shouldBe expTok
    m.map(_._4).count(_ != 16L) should be <= 1 // full sequences
    // the non-ASCII words contributed real mass: byte tokens exceed the
    // whitespace word count by a wide margin
    expTok should be > 3L * 8L
  }

  test("ivfTrainSized: nlist tracks corpus size with clamps") {
    val (c1, n1) = Ann.ivfTrainSized(embeddings, "embedding",
      targetPerCell = 100)
    n1 shouldBe 5 // 500 vectors / 100
    c1.count() shouldBe 5L
    val (_, n2) = Ann.ivfTrainSized(
      embeddings.unionByName(embeddings.withColumn("vec_id",
        col("vec_id") + 1000L)), "embedding", targetPerCell = 100)
    n2 shouldBe 10 // cells grow with the corpus
    Ann.ivfTrainSized(embeddings.limit(10), "embedding",
      targetPerCell = 100)._2 shouldBe 2 // floor clamp
    Ann.ivfTrainSized(embeddings, "embedding", targetPerCell = 1,
      maxNlist = 32)._2 shouldBe 32 // ceiling clamp
  }

  test("recallAtK: self-recall is 1; disjoint approx is 0") {
    val q = embeddings.where(col("vec_id") < 10)
    val exact = Ann.bruteTopK(embeddings, q, "vec_id", "embedding", k = 5,
      rankOnRoundedTo = Some(6))
    val (ne, nh, rec) = Ann.recallAtK(exact, exact, 5)
      .as[(Long, Long, Double)].collect().head
    ne shouldBe 50L; nh shouldBe 50L; rec shouldBe 1.0
    val shifted = exact.withColumn("neighbor_id", col("neighbor_id") + 100000L)
    Ann.recallAtK(shifted, exact, 5)
      .as[(Long, Long, Double)].collect().head._3 shouldBe 0.0
  }
}
