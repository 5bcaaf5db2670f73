package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-12 operators: shard-layout detokenization (the
  * loader-side invertibility audit), dataset-version diff, and
  * length-bucketed dynamic batching.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- detokenizeShards

  test("detokenizeShards reconstructs every document exactly from the persisted artifacts") {
    val sel = Seq((1L, "ab ab ba"), (2L, "ba")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val dir = java.nio.file.Files.createTempDirectory("detok").toString
    Corpus.trainShardsFrom(sel, "doc_id", "text", merges, dir,
      seqLen = 4, epochs = 2, shardSize = 2)
    val out = Corpus.detokenizeShards(spark, dir,
      Packing.packBoundaries(sel, "doc_id", "text", merges, seqLen = 4),
      sel, "doc_id", "text",
      Bpe.vocabulary(sel, "doc_id", "text", merges), seqLen = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "lossless")
      .as[(Long, Long, Boolean)].collect().toSeq
    // doc 1: "ab","ab","ba" → [ab],[ab],[b,a] = 4 ids; doc 2: "ba" → 2
    out shouldBe Seq((1L, 4L, true), (2L, 2L, true))
  }

  test("detokenizeShards flags a corrupted payload as lossy") {
    val sel = Seq((1L, "ab ab ba"), (2L, "ba")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val dir = java.nio.file.Files.createTempDirectory("detok2").toString
    Corpus.trainShardsFrom(sel, "doc_id", "text", merges, dir,
      seqLen = 4, epochs = 1, shardSize = 2)
    // a "loader" whose text drifted from what was sharded must not pass
    val drifted = Seq((1L, "ab ab ba"), (2L, "bb")).toDF("doc_id", "text")
    val out = Corpus.detokenizeShards(spark, dir,
      Packing.packBoundaries(sel, "doc_id", "text", merges, seqLen = 4),
      drifted, "doc_id", "text",
      Bpe.vocabulary(sel, "doc_id", "text", merges), seqLen = 4)
      .orderBy("doc_id").select("doc_id", "lossless")
      .as[(Long, Boolean)].collect().toSeq
    out shouldBe Seq((1L, true), (2L, false))
  }

  // ----------------------------------------------------- manifestDiff

  test("manifestDiff labels added/removed/kept and detects moved positions") {
    val oldSel = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "cum")
    val newSel = Seq((2L, 20L), (3L, 25L), (4L, 40L)).toDF("doc_id", "cum")
    val out = Corpus.manifestDiff(oldSel, newSel, "doc_id", "cum")
      .orderBy("doc_id")
      .select("doc_id", "status", "changed")
      .as[(Long, String, Boolean)].collect().toSeq
    out shouldBe Seq(
      (1L, "removed", true),
      (2L, "kept", false),
      (3L, "kept", true),
      (4L, "added", true))
  }

  // ------------------------------------------------------- tokenDrift

  test("tokenDrift ranks smoothed probability movers with KL contributions") {
    val oldDocs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val newDocs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Corpus.tokenDrift(oldDocs, newDocs, "doc_id", "text")
      .select("word", "n_old", "n_new", "delta")
      .as[(String, Long, Long, Double)].collect().toSeq
    // union vocab {a,b,c}: p_old = (n+1)/6, p_new = (n+1)/8
    out shouldBe Seq(
      ("a", 2L, 2L, -0.125),
      ("c", 0L, 1L, 0.083333),
      ("b", 1L, 2L, 0.041667))
  }

  test("tokenDriftFromCounts equals tokenDrift over the same snapshots") {
    val oldDocs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val newDocs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val fromDocs = Corpus.tokenDrift(oldDocs, newDocs, "doc_id", "text")
      .collect().toSeq
    val fromCounts = Corpus.tokenDriftFromCounts(
      Seq(("a", 2L), ("b", 1L)).toDF("word", "freq"),
      Seq(("a", 2L), ("b", 2L), ("c", 1L)).toDF("word", "freq"))
      .collect().toSeq
    fromCounts shouldBe fromDocs
  }

  // ----------------------------------------------------- readShardsAsOf

  test("readShardsAsOf reproduces each historical layout from the same files") {
    import graft.streaming.ShardMaintainer
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    val b0 = Seq((1L, "1:2", 2L), (2L, "3", 1L))
      .toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(b0, 0L, epochs = 1, shardSize = 2, dir)
    // wave 1 retroactively de-selects seq 2 and adds seq 3
    val b1 = Seq((1L, "1:2", 2L), (3L, "4:5", 2L))
      .toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(b1, 1L, epochs = 1, shardSize = 2, dir)
    def seqsAt(asOf: Long) =
      ShardMaintainer.readShardsAsOf(spark, dir, asOf)
        .select("seq_id").as[Long].collect().toSet
    seqsAt(0L) shouldBe Set(1L, 2L) // before the de-selection existed
    seqsAt(1L) shouldBe Set(1L, 3L)
    ShardMaintainer.readShardsLive(spark, dir)
      .select("seq_id").as[Long].collect().toSet shouldBe Set(1L, 3L)
  }

  test("compactTombstones preserves the live view, retires sidecars, keeps later as-of horizons") {
    import graft.streaming.ShardMaintainer
    val dir = java.nio.file.Files.createTempDirectory("cmpt").toString
    val b0 = Seq((1L, "1:2", 2L), (2L, "3", 1L), (4L, "9", 1L))
      .toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(b0, 0L, epochs = 1, shardSize = 2, dir)
    val b1 = Seq((1L, "1:2", 2L), (3L, "4:5", 2L), (4L, "9", 1L))
      .toDF("seq_id", "ids_str", "n_tok") // drops seq 2
    ShardMaintainer.reconcile(b1, 1L, epochs = 1, shardSize = 2, dir)
    val before = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    ShardMaintainer.deadFraction(spark, dir) shouldBe 0.25 +- 1e-12
    ShardMaintainer.compactTombstones(spark, dir, upTo = 1L)
    val after = ShardMaintainer.readShardsLive(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    after shouldBe before
    // folded sidecars retired; dead rows physically gone
    new java.io.File(s"$dir/tomb").listFiles() match {
      case null => ()
      case fs => fs.count(_.getName.startsWith("b")) shouldBe 0
    }
    ShardMaintainer.deadFraction(spark, dir) shouldBe 0.0
    // as-of at the compaction horizon still answers exactly
    ShardMaintainer.readShardsAsOf(spark, dir, 1L)
      .select("seq_id").as[Long].collect().toSet shouldBe Set(1L, 3L, 4L)
  }

  // ----------------------------------------------------------- rrfFuse

  test("rrfFuse combines ranked lists by reciprocal rank with stable ties") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("qid", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("qid", "doc_id", "rank")
    val out = TfIdf.rrfFuse(a, b, "qid", "doc_id", k = 10)
      .orderBy("rank")
      .select("doc_id", "rrf", "rank")
      .as[(Long, Double, Long)].collect().toSeq
    // doc 20 in both lists: 1/62 + 1/61; doc 10 only sparse: 1/61; doc 30
    // only dense: 1/62
    out shouldBe Seq(
      (20L, 0.032522, 1L),
      (10L, 0.016393, 2L),
      (30L, 0.016129, 3L))
  }

  // ----------------------------------------------- temperatureWeights

  test("temperatureWeights follows the n^alpha rule") {
    val df = Seq(("A", 1L, 16L), ("A", 2L, 0L), ("B", 3L, 81L))
      .toDF("source", "id", "n_tok")
    val w5 = Sampling.temperatureWeights(df, "source", "n_tok", alpha = 0.5)
    w5("A") shouldBe 4.0 +- 1e-12
    w5("B") shouldBe 9.0 +- 1e-12
    // alpha = 0: uniform regardless of size
    val w0 = Sampling.temperatureWeights(df, "source", "n_tok", alpha = 0.0)
    w0("A") shouldBe 1.0
    w0("B") shouldBe 1.0
  }

  // ---------------------------------------------- lengthBucketBatches

  test("lengthBucketBatches cuts (len, key)-ordered buckets and accounts padding") {
    // bucketWidth 4: lens 1,2,3 → bucket 0; lens 5,6 → bucket 1
    val items = Seq((1L, 3L), (2L, 1L), (3L, 2L), (4L, 6L), (5L, 5L))
      .toDF("id", "len")
    val out = Packing.lengthBucketBatches(items, "id", "len",
        bucketWidth = 4, batchSize = 2)
      .orderBy("bucket", "batch_id")
      .select("bucket", "batch_id", "n_items", "pad_len", "actual_tok",
        "padded_tok")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      // bucket 0 ordered [1,2,3]: batch {1,2} pads to 2, batch {3} exact
      (0L, 0L, 2L, 2L, 3L, 4L),
      (0L, 1L, 1L, 3L, 3L, 3L),
      // bucket 1 ordered [5,6]: one batch padded to 6
      (1L, 0L, 2L, 6L, 11L, 12L))
    val waste = Packing.lengthBucketBatches(items, "id", "len",
        bucketWidth = 4, batchSize = 2)
      .where(col("bucket") === 0 && col("batch_id") === 0)
      .select("waste_frac").as[Double].head()
    waste shouldBe 0.25
  }

  test("lengthBucketBatches raises on a negative length instead of misordering") {
    val bad = Seq((1L, -3L)).toDF("id", "len")
    intercept[Exception] {
      Packing.lengthBucketBatches(bad, "id", "len", bucketWidth = 4,
        batchSize = 2).collect()
    }
  }
}
