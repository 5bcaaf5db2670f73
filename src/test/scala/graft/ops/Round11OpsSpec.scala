package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-11 operators: append-stable shard maintenance,
  * batch BM25 / BM25-driven decontamination.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the trip"),
    (3L, "sphinx of black quartz judge my vow said the old sage"),
    (4L, "how vexingly quick daft zebras jump over fences all day"),
    (5L, "five quick brown foxes pack quartz jugs for my lazy judge"))
    .toDF("doc_id", "text")

  // --------------------------------------------- append-stable ordering

  test("epochOrderBatchMajor == cumulative epochOrderAppended; batches never interleave") {
    val items = spark.range(0, 30)
      .select(col("id").as("k"), (col("id") % 3).as("b"))
    val oneShot = Packing.epochOrderBatchMajor(items, "k", "b", epochs = 2)
      .as[(Int, Long, Long)].collect().toSet
    var offset = 0L
    val streamed = (0L until 3L).flatMap { b =>
      val delta = items.where(col("b") === b).select("k")
      val part = Packing.epochOrderAppended(delta, "k", epochs = 2, offset)
        .as[(Int, Long, Long)].collect()
      offset += delta.count()
      part
    }.toSet
    streamed shouldBe oneShot
    // batch-major: every batch-0 ord precedes every batch-1 ord, per epoch
    val byBatch = oneShot.groupBy { case (e, k, _) => (e, k % 3) }
      .view.mapValues(_.map(_._3)).toMap
    for (e <- 1 to 2; b <- 0L until 2L)
      byBatch((e, b)).max should be < byBatch((e, b + 1)).min
    // append-stability: adding a LATER batch never moves an earlier ord
    val grown = Packing.epochOrderBatchMajor(
      items.unionByName(Seq((100L, 9L)).toDF("k", "b")), "k", "b", 2)
      .as[(Int, Long, Long)].collect().toSet
    oneShot.subsetOf(grown) shouldBe true
  }

  // --------------------------------------------- ShardMaintainer

  test("ShardMaintainer: streamed batches == one-shot batch-major writeShards; old files untouched; replay idempotent") {
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10,
      minCount = 1L)
    val payload = Packing.packTokenIdRows(docs, "doc_id", "text", merges,
      seqLen = 8).cache()
    payload.count() should be >= 4L
    val dir = java.nio.file.Files.createTempDirectory("shards_s").toString
    def files(): Set[String] =
      new java.io.File(s"$dir/data").listFiles()
        .filter(_.getName.startsWith("epoch=")).flatMap(_.listFiles())
        .flatMap(_.listFiles()).map(_.getPath)
        .filter(_.endsWith(".parquet")).toSet
    (0 until 3).foreach { g =>
      graft.streaming.ShardMaintainer.processBatch(
        payload.where(col("seq_id") % 3 === g), g.toLong, epochs = 2,
        shardSize = 2, dir)
    }
    // equality with the ONE-SHOT write under the same batch-major law
    val oneDir = java.nio.file.Files.createTempDirectory("shards_o").toString
    Corpus.writeShards(
      Packing.epochOrderBatchMajor(
        payload.select(col("seq_id"), (col("seq_id") % 3).as("b")),
        "seq_id", "b", epochs = 2),
      payload, shardSize = 2, oneDir)
    val got = graft.streaming.ShardMaintainer.readShards(spark, dir)
      .as[(Int, Long, Long, Long, Long, String)].collect().toSet
    val want = Corpus.readShards(spark, oneDir)
      .as[(Int, Long, Long, Long, Long, String)].collect().toSet
    got shouldBe want
    // append-stability on DISK: re-ingesting nothing new, a 4th batch of
    // fresh rows must leave every pre-existing COMPLETE shard file alone
    // (parquet part-file names are fresh UUIDs per write — an untouched
    // path proves the partition was not rewritten)
    val before = files()
    val extra = payload.limit(1)
      .select((col("seq_id") + 1000L).as("seq_id"), col("ids_str"),
        col("n_tok"))
    graft.streaming.ShardMaintainer.processBatch(extra, 3L, epochs = 2,
      shardSize = 2, dir)
    val after = files()
    val total = payload.count()
    val boundary = total / 2 // shardSize 2
    val untouched = before.filter(!_.contains(s"shard_id=$boundary"))
    untouched.subsetOf(after) shouldBe true
    // replay of the last batch rewrites identical content, no duplication
    graft.streaming.ShardMaintainer.processBatch(extra, 3L, epochs = 2,
      shardSize = 2, dir)
    val replayed = graft.streaming.ShardMaintainer.readShards(spark, dir)
    replayed.count() shouldBe 2L * (total + 1)
    replayed.groupBy("epoch", "seq_id").count()
      .agg(max("count")).head().getLong(0) shouldBe 1L
    graft.Exec.deletePath(dir); graft.Exec.deletePath(oneDir)
  }

  test("ShardMaintainer.reconcile: appends new, tombstones de-selected, never moves a surviving ord") {
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10,
      minCount = 1L)
    val payload = Packing.packTokenIdRows(docs, "doc_id", "text", merges,
      seqLen = 8).cache()
    val n = payload.count()
    n should be >= 5L
    val dir = java.nio.file.Files.createTempDirectory("shards_r").toString
    graft.streaming.ShardMaintainer.reconcile(
      payload.where(col("seq_id") < 4), 0L, epochs = 2, shardSize = 2, dir)
    val before = graft.streaming.ShardMaintainer.readShardsLive(spark, dir)
      .select("epoch", "seq_id", "ord")
      .as[(Int, Long, Long)].collect()
      .map { case (e, s0, o) => ((e, s0), o) }.toMap
    // wave 1: seq 1 is retroactively DE-selected; seqs >= 4 arrive
    graft.streaming.ShardMaintainer.reconcile(
      payload.where(col("seq_id") =!= 1), 1L, epochs = 2, shardSize = 2, dir)
    val live = graft.streaming.ShardMaintainer.readShardsLive(spark, dir)
      .select("epoch", "seq_id", "ord")
      .as[(Int, Long, Long)].collect()
    live.map(_._2).toSet shouldBe
      payload.where(col("seq_id") =!= 1).select("seq_id")
        .as[Long].collect().toSet
    // surviving wave-0 ords are untouched; seq 1's ord is a hole
    live.filter(t => t._2 < 4).foreach { case (e, s0, o) =>
      o shouldBe before((e, s0))
    }
    val beforeOrd1 = before((1, 1L))
    live.filter(_._1 == 1).map(_._3) should not contain beforeOrd1
    // replay of the reconcile is idempotent
    graft.streaming.ShardMaintainer.reconcile(
      payload.where(col("seq_id") =!= 1), 1L, epochs = 2, shardSize = 2, dir)
    graft.streaming.ShardMaintainer.readShardsLive(spark, dir)
      .select("epoch", "seq_id", "ord")
      .as[(Int, Long, Long)].collect().toSet shouldBe live.toSet
    graft.Exec.deletePath(dir)
  }

  // --------------------------------------------- batch BM25

  test("bm25SearchBatch == per-query bm25FromPostings") {
    val post = TfIdf.postings(docs, "doc_id", "text")
    val queries = Seq(
      (10L, "quick"), (10L, "quartz"),
      (11L, "liquor"), (11L, "jugs"), (11L, "trip"))
      .toDF("qid", "term")
    val batch = TfIdf.bm25SearchBatch(post, "doc_id", queries, "qid",
        "term", k = 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    val single = Seq(10L -> Seq("quick", "quartz"),
        11L -> Seq("liquor", "jugs", "trip"))
      .flatMap { case (qid, terms) =>
        TfIdf.bm25FromPostings(post, "doc_id", terms, k = 3)
          .as[(Long, Double, Long)].collect()
          .map { case (id, s, r) => (qid, id, s, r) }
      }.toSet
    batch shouldBe single
  }

  test("SearchIndexMaintainer: compacted lengths sidecar serves identically, delta batches fold in") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_side").toString
    (0 until 3).foreach { g =>
      graft.streaming.SearchIndexMaintainer.processBatch(
        docs.where(col("doc_id") % 3 === g), g.toLong, "doc_id", "text",
        dir)
      if (g == 1)
        graft.streaming.SearchIndexMaintainer.compact(spark, "doc_id", dir)
    }
    // sidecar exists at the compaction horizon (upTo = max batch − 1 = 0)
    new java.io.File(dir, "len_c0").exists() shouldBe true
    // state-derived lengths (sidecar + b1/b2 deltas) == full re-aggregation
    val dl = graft.streaming.SearchIndexMaintainer
      .lengthsFromState(spark, "doc_id", dir)
    dl.isDefined shouldBe true
    val fromState = dl.get.as[(Long, Long)].collect().toSet
    val full = TfIdf.postings(docs, "doc_id", "text")
      .groupBy("doc_id").agg(sum("tf").as("len"))
      .as[(Long, Long)].collect().toSet
    fromState shouldBe full
    // the served ranking equals the one-shot scan
    val served = graft.streaming.SearchIndexMaintainer.search(spark, dir,
        "doc_id", query = Seq("quick", "jugs"), k = 5)
      .as[(Long, Double, Long)].collect().toSet
    val oneShot = TfIdf.bm25Search(docs, "doc_id", "text",
        query = Seq("quick", "jugs"), k = 5)
      .as[(Long, Double, Long)].collect().toSet
    served shouldBe oneShot
    // a later compact supersedes the sidecar (old one dropped)
    graft.streaming.SearchIndexMaintainer.compact(spark, "doc_id", dir)
    new java.io.File(dir, "len_c0").exists() shouldBe false
    new java.io.File(dir, "len_c1").exists() shouldBe true
    graft.Exec.deletePath(dir)
  }

  test("streamed passage index + sidecar ranks the eval suite == one-shot bm25Decontaminate") {
    val corpus = docs.where(col("doc_id") >= 3)
    val eval = docs.where(col("doc_id") < 3)
    val dir = java.nio.file.Files.createTempDirectory("bm25_dc").toString
    (0 until 3).foreach { g =>
      val passages = corpus.where(col("doc_id") % 3 === g)
        .select(col("doc_id"),
          explode(TextOps.slidingChunks(col("text"), width = 6,
            stride = 3)).as("c"))
        .select((col("doc_id") * 100000L + col("c.chunk_idx")).as("pid"),
          col("c.chunk").as("ptext"))
      graft.streaming.SearchIndexMaintainer.processBatch(passages,
        g.toLong, "pid", "ptext", dir)
      if (g == 1)
        graft.streaming.SearchIndexMaintainer.compact(spark, "pid", dir)
    }
    val q = eval.select(col("doc_id").as("eval_id"),
      explode(TextOps.tokens(col("text"))).as("term")).distinct()
    val streamed = graft.streaming.SearchIndexMaintainer.searchBatch(
        spark, dir, "pid", q, "eval_id", "term", k = 3)
      .select(col("eval_id"), expr("pid div 100000").as("doc_id"),
        (col("pid") % 100000L).as("chunk_idx"), col("score"), col("rank"))
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val oneShot = Corpus.bm25Decontaminate(corpus, eval, "doc_id", "text",
        k = 3, width = 6, stride = 3)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    streamed shouldBe oneShot
    streamed should not be empty
    graft.Exec.deletePath(dir)
  }

  test("bm25Decontaminate surfaces paraphrase leakage the n-gram audit misses") {
    val corpus = Seq(
      (25L, "the zorblax theorem proves quixotic manifolds collapse " +
        "under vexing hyperbolic strain as shown in prior work"),
      (26L, "completely unrelated text about cooking pasta with garlic " +
        "and olive oil on a tuesday evening at home"))
      .toDF("doc_id", "text")
    // reworded: shares the rare vocabulary, no 5-gram survives
    val eval = Seq(
      (1L, "quixotic manifolds do collapse when hyperbolic strain gets " +
        "vexing says the zorblax theorem"))
      .toDF("doc_id", "text")
    // exact n-gram audit: zero overlap at n=5
    Corpus.contaminationPairs(corpus, eval, "doc_id", "text", n = 5)
      .count() shouldBe 0L
    // BM25 audit: the paraphrased source is the top hit for the eval doc
    val top = Corpus.bm25Decontaminate(corpus, eval, "doc_id", "text",
        k = 2, width = 10, stride = 5)
      .where(col("rank") === 1).select("eval_id", "doc_id")
      .as[(Long, Long)].collect()
    top shouldBe Array((1L, 25L))
  }
}
