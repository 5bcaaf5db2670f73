package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-10 operators: corpus-scale hard-negative mining,
  * shard materialization, and text–image pair construction.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

  // ------------------------------------------------------ quantizer sizing

  test("ivfTrainBalanced sizes nlist by sqrt(N), clamped") {
    val (_, n1) = Ann.ivfTrainBalanced(embeddings.limit(100), "embedding",
      cellsPerSqrtN = 4)
    n1 shouldBe 40 // 4 * ceil(sqrt(100))
    val (_, n2) = Ann.ivfTrainBalanced(embeddings.limit(100), "embedding",
      cellsPerSqrtN = 4, maxNlist = 16)
    n2 shouldBe 16
    // degenerate corpus: nlist clamps to N (KMeans can't exceed the points)
    val (_, n3) = Ann.ivfTrainBalanced(embeddings.limit(1), "embedding")
    n3 shouldBe 1
    val (_, n4) = Ann.ivfTrainSized(embeddings.limit(1), "embedding")
    n4 shouldBe 1
  }

  test("curriculumOrder: epoch 1 easiest-first; later epochs equal the md5 shuffle") {
    val items = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 10L))
      .toDF("id", "difficulty")
    val out = Packing.curriculumOrder(items, "id", "difficulty", epochs = 2)
      .cache()
    val e1 = out.where(col("epoch") === 1).orderBy("ord")
      .select("id").as[Long].collect().toSeq
    e1 shouldBe Seq(2L, 4L, 3L, 1L) // ascending difficulty, id tie-break
    // epoch 2 is exactly epochOrder's epoch-2 permutation
    val e2 = out.where(col("epoch") === 2)
      .select("id", "ord").as[(Long, Long)].collect().toSet
    val ref = Packing.epochOrder(items.select("id"), "id", epochs = 2)
      .where(col("epoch") === 2)
      .select("id", "ord").as[(Long, Long)].collect().toSet
    e2 shouldBe ref
    // a negative score raises rather than silently misordering
    val bad = Seq((1L, -5L)).toDF("id", "difficulty")
    intercept[Exception] {
      Packing.curriculumOrder(bad, "id", "difficulty", epochs = 1)
        .collect()
    }
  }

  // --------------------------------------------------------------- bm25

  test("bm25Search: non-matching docs never surface; tf and brevity raise rank") {
    val docs = Seq(
      (1L, "spark spark spark query"),           // high tf, short
      (2L, "spark table table table table table table table table table"),
      (3L, "table scan filter join"),            // no match
      (4L, "spark query"))                       // tf 1, shortest
      .toDF("doc_id", "text")
    val out = TfIdf.bm25Search(docs, "doc_id", "text", Seq("spark"), k = 10)
      .cache()
    out.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L, 4L)
    val ranks = out.select("doc_id", "rank").as[(Long, Long)].collect().toMap
    ranks(1L) shouldBe 1L            // most occurrences, short doc
    (ranks(4L) < ranks(2L)) shouldBe true // same tf=1: shorter doc wins
    // deterministic re-derivation
    TfIdf.bm25Search(docs, "doc_id", "text", Seq("spark"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSet shouldBe
      out.select("doc_id", "score").as[(Long, Double)].collect().toSet
  }

  test("SearchIndexMaintainer: streamed postings rank == one-shot bm25Search") {
    import graft.streaming.SearchIndexMaintainer
    val docs = Seq(
      (1L, "spark spark query table"),
      (2L, "spark table scan"),
      (3L, "table scan filter join merge"),
      (4L, "merge spark merge"),
      (5L, "query query query"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25stream").toString
    (0 until 3).foreach { g =>
      SearchIndexMaintainer.processBatch(docs.where(col("doc_id") % 3 === g),
        g.toLong, "doc_id", "text", s"$dir/state")
      if (g == 1) SearchIndexMaintainer.compact(spark, "doc_id", s"$dir/state")
    }
    val streamed = SearchIndexMaintainer.search(spark, s"$dir/state",
        "doc_id", Seq("spark", "merge"), k = 10)
      .as[(Long, Double, Long)].collect().toSeq.sorted
    val oneShot = TfIdf.bm25Search(docs, "doc_id", "text",
        Seq("spark", "merge"), k = 10)
      .as[(Long, Double, Long)].collect().toSeq.sorted
    streamed shouldBe oneShot
    graft.Exec.deletePath(dir)
  }

  // --------------------------------------------------- cross-modal plumbing

  test("textEmbedding: deterministic, dim-sized, word-order-free per bag") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // same bag, different order
      (3L, "alpha beta delta"))
      .toDF("id", "text")
      .select(col("id"), TextOps.textEmbedding(col("text"), 8).as("v"))
      .cache()
    val rows = df.as[(Long, Seq[Double])].collect().toMap
    rows(1L).length shouldBe 8
    rows(1L) shouldBe rows(2L) // bag-of-words: order-free
    rows(1L) should not be rows(3L)
    // re-derivation is bit-identical
    val again = Seq((1L, "alpha beta gamma")).toDF("id", "text")
      .select(TextOps.textEmbedding(col("text"), 8))
      .head().getSeq[Double](0)
    again shouldBe rows(1L)
  }

  test("ClipPairMaintainer: streamed state == one-shot pairs; reassignment is retroactive") {
    import graft.streaming.ClipPairMaintainer
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks back home across the quiet field with a steady pace today"
    val docs = (0L until 9L).map(i => (i, good + s" tail$i")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(spark, 4)
    val dir = java.nio.file.Files.createTempDirectory("clipstream").toString
    (0 until 3).foreach { g =>
      ClipPairMaintainer.processBatch(docs.where(col("doc_id") % 3 === g),
        g.toLong, "doc_id", "text", 1.0, "en", s"$dir/state")
      if (g == 1) ClipPairMaintainer.compact(spark, "doc_id", s"$dir/state")
    }
    val streamed = ClipPairMaintainer.pairs(spark, s"$dir/state", media,
        "doc_id", dim = 8)
      .select("doc_id", "media_id").as[(Long, Long)].collect().toSet
    val oneShot = Multimodal.clipPairs(docs, media, "doc_id", "text",
        minQuality = 1.0, keepLang = "en", dim = 8)
      .select("doc_id", "media_id").as[(Long, Long)].collect().toSet
    streamed shouldBe oneShot
    // retroactivity: the 2-wave state assigns at least one doc a different
    // image than the full 3-wave state (the md5 rank shifts as docs land)
    val dir2 = java.nio.file.Files.createTempDirectory("clipstream2").toString
    (0 until 2).foreach { g =>
      ClipPairMaintainer.processBatch(docs.where(col("doc_id") % 3 === g),
        g.toLong, "doc_id", "text", 1.0, "en", s"$dir2/state")
    }
    val partial = ClipPairMaintainer.pairs(spark, s"$dir2/state", media,
        "doc_id", dim = 8)
      .select("doc_id", "media_id").as[(Long, Long)].collect().toMap
    val full = oneShot.toMap
    partial.keySet.exists(k => partial(k) != full(k)) shouldBe true
    graft.Exec.deletePath(dir); graft.Exec.deletePath(dir2)
  }

  // ------------------------------------------------- hard-negatives graph

  test("hardNegativesGraph probing ALL cells == exact corpus-as-queries hardNegatives") {
    val sub = embeddings.where(col("vec_id") < 120).cache()
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(sub, "embedding", nlist = 4))
    // nprobe = nlist: every query probes every cell, so the candidate set
    // is all different-label pairs — the graph path must equal the exact
    // broadcast baseline with corpus == queries
    val graph = Ann.hardNegativesGraph(sub, "vec_id", "embedding", "label",
        k = 5, cents, nprobe = 4, rankOnRoundedTo = Some(6))
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val exact = Ann.hardNegatives(sub, sub, "vec_id", "embedding", "label",
        k = 5, rankOnRoundedTo = Some(6))
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    graph shouldBe exact
  }

  // ------------------------------------------------------- shard writer

  test("writeShards materializes one file per shard, ord-sorted, token-conserving") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the trip"),
      (3L, "sphinx of black quartz judge my vow said the old sage"),
      (4L, "how vexingly quick daft zebras jump over fences all day"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10,
      minCount = 1L)
    val payload = Packing.packTokenIdRows(docs, "doc_id", "text", merges,
      seqLen = 16).cache()
    val ord = Packing.epochOrder(payload.select("seq_id"), "seq_id", 2)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Corpus.writeShards(ord, payload, shardSize = 2, dir)
    // exactly one parquet file per (epoch, shard) directory
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("epoch=")).flatMap(_.listFiles())
      .filter(_.getName.startsWith("shard_id="))
    shardDirs should not be empty
    all(shardDirs.map(_.listFiles()
      .count(_.getName.endsWith(".parquet")))) shouldBe 1
    val back = Corpus.readShards(spark, dir).cache()
    // token + id-sum conservation: payload on disk == packed sequences,
    // once per epoch
    val diskTok = back.agg(
      expr("sum(size(split(ids_str, ':')))")).head().getLong(0)
    val srcTok = payload.agg(sum(col("n_tok"))).head().getLong(0)
    diskTok shouldBe 2L * srcTok
    back.select("seq_id", "ids_str").distinct().count() shouldBe
      payload.count()
    // within every shard file, rows are in ascending ord (file row order —
    // read without sorting and check monotonicity per shard)
    val perShard = back.select("epoch", "shard_id", "ord")
      .as[(Int, Long, Long)].collect().toSeq
      .groupBy(t => (t._1, t._2)).values
    all(perShard.map(rs => rs.map(_._3) == rs.map(_._3).sorted)) shouldBe true
    graft.Exec.deletePath(dir)
  }

  // ---------------------------------------------- interleaved packing

  test("packTokenIdsInterleaved splices image tokens before text, conserving counts") {
    val docs = Seq(
      (1L, "aa bb aa"),
      (2L, "bb cc bb aa"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 4,
      minCount = 1L)
    // 3 image tokens per doc, img_ord 0..5
    val imgPrefix = Seq(
      (1L, 1, 0L), (1L, 2, 3L), (1L, 3, 1L),
      (2L, 1, 5L), (2L, 2, 2L), (2L, 3, 4L))
      .toDF("doc_id", "tpos", "img_ord")
    val plain = Packing.packTokenIds(docs, "doc_id", "text", merges,
      seqLen = 8).cache()
    val mm = Packing.packTokenIdsInterleaved(docs, "doc_id", "text", merges,
      seqLen = 8, imgPrefix).cache()
    val plainTok = plain.agg(sum("n_tok")).head().getLong(0)
    val mmTok = mm.agg(sum("n_tok")).head().getLong(0)
    mmTok shouldBe plainTok + 6 // 3 image tokens per doc
    // image ids live strictly above EOS: id_sum grows by exactly
    // Σ (eos+1+img_ord) — re-derive eos from the vocabulary
    val eos = Bpe.vocabulary(docs, "doc_id", "text", merges)
      .map(_._2).max.toLong + 1
    val plainSum = plain.agg(sum("id_sum")).head().getLong(0)
    val mmSum = mm.agg(sum("id_sum")).head().getLong(0)
    mmSum shouldBe plainSum + (0L to 5L).map(eos + 1 + _).sum
  }

  test("packBoundaries partitions every sequence's tokens among its docs") {
    val docs = Seq(
      (1L, "aa bb aa bb aa"),
      (2L, "bb cc bb aa cc aa"),
      (3L, "cc aa"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 4,
      minCount = 1L)
    val seqs = Packing.packTokenIds(docs, "doc_id", "text", merges,
      seqLen = 8).cache()
    val b = Packing.packBoundaries(docs, "doc_id", "text", merges,
      seqLen = 8).cache()
    // the sidecar partitions each sequence's tokens exactly
    val bySeq = b.groupBy("seq_id")
      .agg(sum("n_tok_in_seq").as("t"), min("start_pos").as("mn"))
    bySeq.join(seqs, Seq("seq_id"))
      .where(col("t") =!= col("n_tok")).count() shouldBe 0L
    // every sequence's earliest boundary is position 0 (a doc or its
    // continuation always begins the sequence)
    bySeq.where(col("mn") =!= 0).count() shouldBe 0L
    // doc spans are contiguous: start_pos + n_tok_in_seq never exceeds
    // the sequence length
    b.where(col("start_pos") + col("n_tok_in_seq") > 8).count() shouldBe 0L
  }

  // --------------------------------------------------------- clip pairs

  test("clipPairs gates on quality and language, pairs deterministically") {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks back home across the quiet field with a steady pace today"
    val docs = Seq(
      (1L, good),
      (2L, good + " again and again with more of the same words to say"),
      (3L, "aa bb"), // too few tokens → quality gate drops it
      (4L, "le chat et le chien et la maison et le pain et le vin et " +
        "la rue et le jour et la nuit et les gens et les choses de la vie"))
      .toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(spark, 3)
    val out = Multimodal.clipPairs(docs, media, "doc_id", "text",
      minQuality = 1.0, keepLang = "en", dim = 8).cache()
    out.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)
    // assignment is a pure function of the kept set: re-derivation agrees
    val again = Multimodal.clipPairs(docs, media, "doc_id", "text",
      minQuality = 1.0, keepLang = "en", dim = 8)
    again.select("doc_id", "media_id").as[(Long, Long)].collect().toSet shouldBe
      out.select("doc_id", "media_id").as[(Long, Long)].collect().toSet
    // the embedding norm is the real featurizer's, not a placeholder
    val norms = Multimodal.imageEmbedding(media, dim = 8)
      .select(col("media_id"), sqrt(graft.functions.VectorFns.dotNative(
        col("embedding"), col("embedding"))).as("n"))
      .as[(Long, Double)].collect().toMap
    out.select("media_id", "emb_norm").as[(Long, Double)].collect()
      .foreach { case (m, n) => n shouldBe norms(m) +- 1e-12 }
  }

  test("hardNegativesGraphBalanced enforces the per-label quota") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val out = Ann.hardNegativesGraphBalanced(embeddings, "vec_id",
      "embedding", "label", k = 5, perLabel = 1, cents, nprobe = 2,
      rankOnRoundedTo = Some(6)).cache()
    // perLabel = 1: labels never repeat within a query's batch
    out.groupBy("query_id", "neg_label").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count() shouldBe 0L
    // with a huge quota the balanced variant degenerates to the plain graph
    val loose = Ann.hardNegativesGraphBalanced(embeddings, "vec_id",
        "embedding", "label", k = 5, perLabel = 1000, cents, nprobe = 2,
        rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val plain = Ann.hardNegativesGraph(embeddings, "vec_id", "embedding",
        "label", k = 5, cents, nprobe = 2, rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    loose shouldBe plain
  }

  test("hardNegativesGraph never returns a same-label neighbor and bounds rank") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val labels = embeddings.select(col("vec_id").as("query_id"),
      col("label").as("__ql"))
    val out = Ann.hardNegativesGraph(embeddings, "vec_id", "embedding",
      "label", k = 3, cents, nprobe = 2, rankOnRoundedTo = Some(6)).cache()
    out.join(labels, Seq("query_id"))
      .where(col("neg_label") === col("__ql")).count() shouldBe 0L
    out.agg(max(col("rank"))).head().getInt(0) should be <= 3
    // per-query ranks are dense from 1
    out.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .where(col("n") =!= col("mx")).count() shouldBe 0L
  }
}
