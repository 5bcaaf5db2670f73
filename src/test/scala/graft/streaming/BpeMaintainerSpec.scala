package graft.streaming

import graft.SparkSpec
import graft.ops.Bpe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming BPE maintenance: the word-freq state is the exact sufficient
  * statistic, so a relearn from merged per-batch counts must equal the
  * one-shot learn over the cumulative corpus — bit-for-bit, rule-for-rule.
  */
class BpeMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("threshold relearn from merged state == one-shot learn on the cumulative corpus") {
    val base = java.nio.file.Files.createTempDirectory("graft-bpem").toString
    val (st, md) = (s"$base/state", s"$base/model")
    val cfg = BpeMaintainer.Config(numMerges = 6, growthFactor = 0.5)
    val b0 = Seq("aaab aaab aaab", "aab aab")
    val b1 = Seq("baab") // +1 word on 5: under the 50% growth threshold
    val b2 = Seq("aaab aaab aaab aaab baab baab baab baab") // big growth
    // batch 0 (bootstrap): always learns
    BpeMaintainer.processBatch(corpusDf(b0), 0L, "doc_id", "text",
      st, md, cfg) shouldBe true
    BpeMaintainer.latestMeta(md).get._1 shouldBe 0L
    BpeMaintainer.latestMerges(spark, md) shouldBe
      Bpe.learnMerges(corpusDf(b0), "doc_id", "text", 6)
    // batch 1: +1 word on 5 (< 50% growth) — no relearn, model unchanged
    BpeMaintainer.processBatch(corpusDf(b1), 1L, "doc_id", "text",
      st, md, cfg) shouldBe false
    BpeMaintainer.latestMeta(md).get._1 shouldBe 0L
    // batch 2: total 14 >= 1.5×5 — relearn covers ALL THREE batches
    BpeMaintainer.processBatch(corpusDf(b2), 2L, "doc_id", "text",
      st, md, cfg) shouldBe true
    BpeMaintainer.latestMeta(md).get._1 shouldBe 1L
    val cumulative = corpusDf(b0 ++ b1 ++ b2)
    BpeMaintainer.latestMerges(spark, md) shouldBe
      Bpe.learnMerges(cumulative, "doc_id", "text", 6)
    // crash-replay of batch 2: state dirs rewrite identically, the learn
    // trigger derives from idempotent totals — no spurious new version
    val stateBefore = BpeMaintainer.stateWordFreq(spark, st, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    BpeMaintainer.processBatch(corpusDf(b2), 2L, "doc_id", "text",
      st, md, cfg) shouldBe false
    BpeMaintainer.latestMeta(md).get._1 shouldBe 1L
    BpeMaintainer.stateWordFreq(spark, st, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      stateBefore
    // compaction folds committed batches; aggregated state unchanged
    BpeMaintainer.compact(spark, st) // default: up to max-1 = batch 1
    BpeMaintainer.stateWordFreq(spark, st, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      stateBefore
    // replaying below the compaction horizon is rejected, not double-folded
    an[IllegalArgumentException] should be thrownBy
      BpeMaintainer.stateWordFreq(spark, st, 0L)
  }

  test("byte-level mode: incremental relearn == one-shot byte-level learn (mixed scripts)") {
    val base = java.nio.file.Files.createTempDirectory("graft-bpemb").toString
    val (st, md) = (s"$base/state", s"$base/model")
    val cfg = BpeMaintainer.Config(numMerges = 8, growthFactor = 0.3,
      byteLevel = true)
    val b0 = Seq("ssß ssß ssé Straße", "ssß ssé café")
    val b1 = Seq("café café Straße 東京 москва", "ssß 東京 東京")
    BpeMaintainer.processBatch(corpusDf(b0), 0L, "doc_id", "text",
      st, md, cfg) shouldBe true
    BpeMaintainer.latestMerges(spark, md) shouldBe
      Bpe.learnMerges(corpusDf(b0), "doc_id", "text", 8, byteLevel = true)
    BpeMaintainer.processBatch(corpusDf(b1), 1L, "doc_id", "text",
      st, md, cfg) shouldBe true
    BpeMaintainer.latestMerges(spark, md) shouldBe
      Bpe.learnMerges(corpusDf(b0 ++ b1), "doc_id", "text", 8,
        byteLevel = true)
    // byte-mode merges are hex-pair concatenations (even-length hex)
    BpeMaintainer.latestMerges(spark, md).foreach { case (l, r) =>
      (l + r).matches("[0-9A-F]+") shouldBe true
      (l + r).length % 2 shouldBe 0
    }
  }

  test("streaming attach end-to-end: final model == one-shot learn over everything") {
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-bpem2").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val mem = MemoryStream[(Long, String)]
    val cfg = BpeMaintainer.Config(numMerges = 12, growthFactor = 0.2)
    val q = BpeMaintainer.attach(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/state", s"$base/model", s"$base/ckpt", cfg)
    (0 until 3).foreach { g =>
      val wave = docs.where(col("doc_id") % 3 === g)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      mem.addData(wave.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    // growthFactor 0.2: wave 2 (+50%) and wave 3 (+33%) both retrain, so
    // the final model covers the full corpus
    BpeMaintainer.latestMerges(spark, s"$base/model") shouldBe
      Bpe.learnMerges(docs, "doc_id", "text", 12)
    BpeMaintainer.latestMeta(s"$base/model").get._1 should be >= 1L
  }
}
