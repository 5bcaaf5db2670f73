package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: empty frames, empty/short documents, and
  * single-row inputs must flow through every operator family without
  * errors — the difference between a library and a demo.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = spark.createDataFrame(
    new java.util.ArrayList[org.apache.spark.sql.Row](),
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private val degenerate = Seq(
    (1L, ""), (2L, "one"), (3L, "two words"), (4L, "two words")) // short + dup
    .toDF("doc_id", "text")

  test("round-3 ops on empty and degenerate inputs") {
    val emptyKV = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("k", LongType), StructField("t", LongType),
        StructField("v", DoubleType))))
    // resample: empty in, empty out; single row spans one bucket
    Sessions.resampleLastKnown(emptyKV, "k", "t", "v", 10L).count() shouldBe 0L
    val one = Sessions.resampleLastKnown(
      Seq((1L, 7L, 2.0)).toDF("k", "t", "v"), "k", "t", "v", 10L).collect()
    one.length shouldBe 1
    one.head.getDouble(2) shouldBe 2.0
    // heavy hitters: empty in, empty out; threshold above max count -> empty
    Sketch.heavyHitters(emptyDocs, "text", 1).count() shouldBe 0L
    Sketch.heavyHitters(degenerate, "text", 100L).count() shouldBe 0L
    // z-order write of an EMPTY frame must produce a readable empty dir
    val base = java.nio.file.Files.createTempDirectory("graft_edge_z").toString
    graft.sources.Layout.zorderWrite(emptyKV.select("k", "t"),
      Seq("k", "t"), s"$base/z", files = 2)
    spark.read.parquet(s"$base/z").count() shouldBe 0L
    graft.Exec.deletePath(base)
  }

  test("round-4 ops on empty and degenerate inputs") {
    // boilerplate fraction: empty in, empty out; degenerate docs all kept
    // at 0.0 (too short to shingle at n=5 — never dropped, never NaN)
    Corpus.boilerplateFraction(emptyDocs, "doc_id", "text").count() shouldBe 0L
    val bf = Corpus.boilerplateFraction(degenerate, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    bf.keySet shouldBe Set(1L, 2L, 3L, 4L)
    bf.values.foreach(_ shouldBe 0.0)
    // per-key cap: empty in, empty out; cap above group size keeps all
    Sampling.capPerKey(emptyDocs, "text", "doc_id", 3).count() shouldBe 0L
    Sampling.capPerKey(degenerate, "text", "doc_id", 100).count() shouldBe 4L
    // normalizeText: null-safe, empty-safe
    val norm = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, " \t "))
      .toDF("doc_id", "text")
      .select(TextOps.normalizeText(col("text")).as("t")).collect()
    norm.map(r => Option(r.getString(0))).toSeq shouldBe
      Seq(None, Some(""), Some(""))
    // audio decode: zero-sample WAV is valid (rms 0, peak 0, 0 ms)
    val wav = Multimodal.wavBytes(8000, Array.empty[Int])
    Multimodal.decodeWavBatch(Seq(wav)) shouldBe Seq((8000, 0, 0.0, 0.0))
  }

  test("round-5 ops on corrupt and degenerate inputs") {
    // hostile WAV: negative chunk size must FAIL, not loop the executor
    val wav = Multimodal.wavBytes(8000,
      Array.tabulate(16)(t => Multimodal.synthSample(0L, t)))
    val evil = wav.clone()
    val dataSzOff = 40 // canonical layout: 'data' size field
    java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(dataSzOff, -8)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavBatch(Seq(evil))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resampleAudioBatch(Seq(evil), 4000)
    // resample of a zero-sample clip: n_out 0, rms 0 — never a div by zero
    Multimodal.resampleAudioBatch(
      Seq(Multimodal.wavBytes(8000, Array.empty[Int])), 4000) shouldBe
      Seq((8000, 0, 0, 0.0))
    // truncated GIF: header survives but frame data is gone — error, not hang
    val gif = Multimodal.gifBytes(Seq(new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)))
    an[Exception] should be thrownBy
      Multimodal.decodeGifBatch(Seq(gif.take(16)))
    // BPE on an empty / wordless corpus: no merges, zero counts, no crash
    Bpe.learnMerges(emptyDocs, "doc_id", "text", 10) shouldBe Seq.empty
    Bpe.learnMerges(Seq((1L, "!!! ...")).toDF("doc_id", "text"),
      "doc_id", "text", 10) shouldBe Seq.empty
    val counts = Bpe.docTokenCounts(degenerate, "doc_id", "text", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.keySet shouldBe Set(1L, 2L, 3L, 4L)
    // encoding with ZERO merges tokenizes to single characters
    Bpe.encodeVocab(Seq("abc").toDF("word"), Seq.empty)
      .select("toks").head().getSeq[String](0) shouldBe Seq("a", "b", "c")
  }

  test("dedup family on empty and degenerate docs") {
    Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() shouldBe 0L
    Dedup.exactByHash(emptyDocs, "text", "doc_id").count() shouldBe 0L
    Dedup.jaccardPairs(emptyDocs, "doc_id", "text", 3, 0.5).count() shouldBe 0L
    Dedup.minhashLshPairs(emptyDocs, "doc_id", "text").count() shouldBe 0L
    Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() shouldBe 0L
    // docs shorter than the shingle width never pair; the exact dup pairs
    Dedup.jaccardPairs(degenerate, "doc_id", "text", 3, 0.5).count() shouldBe 0L
    val two = Dedup.jaccardPairs(degenerate, "doc_id", "text", 2, 0.5).collect()
    two.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((3L, 4L))
    Dedup.exact(degenerate, Seq("text"), "doc_id").count() shouldBe 3L
  }

  test("connectedComponents on empty edges (both paths)") {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id1", LongType), StructField("id2", LongType))))
    Dedup.connectedComponents(empty).count() shouldBe 0L
    Dedup.connectedComponents(empty, localEdgeLimit = 0).count() shouldBe 0L
  }

  test("text/LM/sampling ops on empty and degenerate docs") {
    TfIdf.topTerms(emptyDocs, "doc_id", "text", 3).count() shouldBe 0L
    LangModel.bigramLogProb(emptyDocs, "doc_id", "text").count() shouldBe 0L
    // empty-string and single-token docs yield no bigrams; the two-token
    // dups score ln(1)=0 for their deterministic transition
    val lm = LangModel.bigramLogProb(degenerate, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    lm.keySet shouldBe Set(3L, 4L)
    lm(3L) shouldBe 0.0 +- 1e-12
    Sampling.hashSample(emptyDocs, "doc_id", 0.5).count() shouldBe 0L
    val q = degenerate.select(TextOps.qualityScore(col("text")).as("q")).collect()
    q.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }

  test("similarity builds on empty and single-user events") {
    val emptyEvents = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("userid", LongType),
        StructField("itemid", LongType), StructField("rating", DoubleType))))
    val c = graft.recdb.EventCols()
    graft.recdb.Similarity.itemCosine(emptyEvents, c).count() shouldBe 0L
    // one user, two items: a single positive co-rating pair
    val one = Seq((1L, 10L, 3.0), (1L, 11L, 4.0)).toDF("userid", "itemid", "rating")
    val m = graft.recdb.Similarity.itemCosine(one, c).collect()
    m.length shouldBe 1
    m.head.getDouble(2) shouldBe 1.0 +- 1e-12 // collinear single-user vectors
    graft.recdb.Scoring.itemCF(one,
      graft.recdb.Similarity.itemCosine(one, c), c).count() shouldBe 2L
  }

  test("incremental LSH: empty index bootstrap and empty delta") {
    val emptyIndex = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", LongType),
        StructField("sig", ArrayType(LongType, containsNull = false)))))
    val docs = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "z y x w v u t s r q")).toDF("doc_id", "text")
    // first batch: no index yet -> within-delta pairs only
    val boot = Dedup.incrementalLshPairs(docs, "doc_id", "text",
      emptyIndex, docs.select(col("doc_id")))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    boot.toSet shouldBe Set((1L, 2L))
    // empty delta: nothing to probe with -> empty output
    val idx = Dedup.minhashSignatures(
      docs.select(col("doc_id").as("id"),
        graft.functions.TextFns.wordShinglesNative(col("text"), 3).as("grams")),
      "id", "grams", 64)
    Dedup.incrementalLshPairs(docs, "doc_id", "text", idx,
      emptyDocs.select(col("doc_id"))).count() shouldBe 0L
  }

  test("round-9 ops on empty and degenerate inputs") {
    import graft.functions.WordPieceFns
    // WordPiece: empty word -> empty pieces; empty vocab -> [UNK]
    val w = Seq("", "ab").toDF("word")
    val enc = w.select(col("word"),
      WordPieceFns.encodeNative(col("word"), Seq("a", "##b")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    enc("") shouldBe Seq()
    enc("ab") shouldBe Seq("a", "##b")
    w.where(col("word") === "ab")
      .select(WordPieceFns.encodeNative(col("word"), Seq.empty).as("t"))
      .collect().head.getSeq[String](0) shouldBe Seq("[UNK]")
    // knnGraph on a single vector: no self-edges -> empty graph
    val one = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    Ann.knnGraph(one, "vec_id", "embedding", k = 3, cents)
      .count() shouldBe 0L
    // nearestCells with n > nCells returns all cells, ranked
    one.select(graft.functions.VectorFns.nearestCellsNative(
        col("embedding").cast("array<double>"), cents, 6, 10).as("c"))
      .collect().head.getSeq[Int](0) shouldBe Seq(0, 1)
    // epochOrder on an empty frame: empty, not a crash
    Packing.epochOrder(one.where(col("vec_id") < 0).select("vec_id"),
      "vec_id", epochs = 2).count() shouldBe 0L
    // hardNegatives when every label matches: no negatives exist
    val same = Seq((1L, Seq(1.0, 0.0), 7), (2L, Seq(0.9, 0.1), 7))
      .toDF("vec_id", "embedding", "label")
    Ann.hardNegatives(same, same, "vec_id", "embedding", "label", k = 3)
      .count() shouldBe 0L
    // imageNearDupPairs on a single image: no pairs
    val png = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    Multimodal.imageNearDupPairs(
      Seq((1L, png)).toDF("media_id", "payload")).count() shouldBe 0L
    // trainManifest when the budget selects nothing: empty manifest
    val tiny = Seq((1L, "too short")).toDF("doc_id", "text")
    Corpus.trainManifest(tiny, "doc_id", "text",
      Seq(("t", "o")), seqLen = 8, epochs = 1).count() shouldBe 0L
  }
}
