package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  lazy val documents =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("clean pipeline: monotone survivor counts, and no near-dup pair survives") {
    val (kept, stats) = Corpus.clean(documents, "doc_id", "text",
      minQuality = 0.5, langs = Seq("en"), nGram = 3, threshold = 0.5)
    stats.input shouldBe 500L
    stats.afterQuality should be <= stats.input
    stats.afterLang should be <= stats.afterQuality
    stats.afterExact should be <= stats.afterLang
    stats.afterNearDup should be < stats.afterExact // corpus has planted dups
    kept.count() shouldBe stats.afterNearDup
    // kept ⊆ input by id
    kept.join(documents, Seq("doc_id"), "anti").count() shouldBe 0L
    // the defining postcondition: re-running near-dup detection on the
    // cleaned corpus finds nothing at the same threshold
    Dedup.jaccardPairs(kept, "doc_id", "text", 3, 0.5).count() shouldBe 0L
    // language filter really applied
    kept.where(TextOps.langId(col("text")) =!= "en").count() shouldBe 0L
  }

  test("boilerplateFraction: closed-form values, short docs at 0, all docs kept") {
    import spark.implicits._
    // doc 1 and 2 share their first 5-gram ("a b c d e"); doc 3 is disjoint;
    // doc 4 is too short to shingle (4 tokens < n=5)
    val docs = Seq(
      (1L, "a b c d e x y"),    // grams: abcde, bcdex, cdexy → 1/3 boiler
      (2L, "a b c d e p q"),    // grams: abcde, bcdep, cdepq → 1/3 boiler
      (3L, "m n o p q r"),      // grams: mnopq, nopqr → 0 boiler
      (4L, "t u v w")           // no grams → 0.0
    ).toDF("doc_id", "text")
    val out = Corpus.boilerplateFraction(docs, "doc_id", "text", n = 5,
        minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    out(1L) shouldBe (1.0 / 3.0) +- 1e-12
    out(2L) shouldBe (1.0 / 3.0) +- 1e-12
    out(3L) shouldBe 0.0
    out(4L) shouldBe 0.0
  }

  test("capPerKey: bound holds, picks are deterministic across layouts") {
    import spark.implicits._
    val rows = (1L to 97L).map(i => (i, s"src${i % 3}"))
    val df = rows.toDF("id", "src")
    val picked = Sampling.capPerKey(df, "src", "id", maxN = 5)
    val bySrc = picked.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.values.foreach(_ shouldBe 5L)
    // same survivors regardless of partition layout
    val ids1 = picked.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.capPerKey(df.repartition(7), "src", "id", maxN = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    ids2 shouldBe ids1
    // a group smaller than the cap survives whole
    val tiny = Seq((1L, "only"), (2L, "only")).toDF("id", "src")
    Sampling.capPerKey(tiny, "src", "id", maxN = 5).count() shouldBe 2L
  }

  test("mixtureSample: fixed quotas from weights×budget, short sources whole, absent sources dropped, layout-free") {
    import spark.implicits._
    val rows = (1L to 90L).map(i => (i, s"src${i % 3}")) // 30 docs each
    val df = rows.toDF("id", "src")
    // Σw = 6; budget 60 → quotas: src0 floor(3/6×60)=30, src1 floor(2/6×60)=20,
    // src2 absent → dropped entirely
    val got = Sampling.mixtureSample(df, "src", "id",
      Map("src0" -> 3.0, "src1" -> 2.0, "srcX" -> 1.0), budget = 60L)
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc shouldBe Map("src0" -> 30L, "src1" -> 20L) // src0 short: all 30 kept
    // the draw is a pure function of (corpus, weights, budget) — not layout
    val ids1 = got.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.mixtureSample(df.repartition(11), "src", "id",
      Map("src0" -> 3.0, "src1" -> 2.0, "srcX" -> 1.0), budget = 60L)
      .select("id").collect().map(_.getLong(0)).toSet
    ids2 shouldBe ids1
    // and agrees with capPerKey under a uniform single-source quota
    val uni = Sampling.mixtureSample(df, "src", "id",
      Map("src1" -> 1.0), budget = 5L).select("id")
      .collect().map(_.getLong(0)).toSet
    uni shouldBe Sampling.capPerKey(df.where(col("src") === "src1"),
      "src", "id", maxN = 5).select("id").collect().map(_.getLong(0)).toSet
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureSample(df, "src", "id", Map.empty, budget = 10L)
  }

  test("mixtureSampleTokens: inclusive per-source cumsum boundary, layout-free") {
    import spark.implicits._
    // tokens: id 1..12 over 2 sources, each doc 10 tokens
    val rows = (1L to 12L).map(i => (i, s"src${i % 2}", 10L))
    val df = rows.toDF("id", "src", "n_tok")
    // Σw = 3; budget 90 → src0 quota 60 (6 docs of 6), src1 quota 30 (3 of 6)
    val got = Sampling.mixtureSampleTokens(df, "src", "id", "n_tok",
      Map("src0" -> 2.0, "src1" -> 1.0), tokenBudget = 90L)
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc shouldBe Map("src0" -> 6L, "src1" -> 3L)
    // cum_tok is the audit column: max per source == docs×10
    got.groupBy("src").agg(max(col("cum_tok")).as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("src0" -> 60L, "src1" -> 30L)
    // the inclusive boundary rule: a quota mid-doc drops that doc
    val cut = Sampling.mixtureSampleTokens(df, "src", "id", "n_tok",
      Map("src1" -> 1.0), tokenBudget = 25L)
    cut.count() shouldBe 2L // 20 <= 25 < 30
    // layout-free
    val ids1 = got.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.mixtureSampleTokens(df.repartition(5), "src", "id",
      "n_tok", Map("src0" -> 2.0, "src1" -> 1.0), tokenBudget = 90L)
      .select("id").collect().map(_.getLong(0)).toSet
    ids2 shouldBe ids1
  }

  test("selectWithinBudget: greedy by quality, exact boundary, distributed == naive") {
    import spark.implicits._
    // (id, tokens, quality): greedy order by (quality desc, id)
    val d = Seq(
      (1L, 40L, 0.75), (2L, 30L, 1.0), (3L, 50L, 0.5),
      (4L, 30L, 1.0), (5L, 10L, 0.25)
    ).toDF("doc_id", "n_tok", "quality")
    // order: 2 (30), 4 (60), 1 (100), 3 (150), 5 (160)
    val kept = Corpus.selectWithinBudget(d, "doc_id", "n_tok", "quality",
        budget = 100L, buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept shouldBe Map(2L -> 30L, 4L -> 60L, 1L -> 100L)
    // distributed matches the naive single-window form on the real corpus
    val scored = documents.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
      TextOps.qualityScore(col("text")).as("quality"))
    val dist = Corpus.selectWithinBudget(scored, "doc_id", "n_tok", "quality",
        budget = 20000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("quality").desc, col("doc_id"))
    val naive = scored.withColumn("cum", sum(col("n_tok")).over(w))
      .where(col("cum") <= 20000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    dist shouldBe naive
    dist.nonEmpty shouldBe true
  }

  test("normalizeText: NFC + whitespace collapse + trim, idempotent") {
    import spark.implicits._
    val dirty = "  cafe\u0301 \t\t x\n\ny  "
    val df = Seq((1L, dirty), (2L, "already clean")).toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.normalizeText(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "caf\u00e9 x y"
    out(2L) shouldBe "already clean"
    // idempotence: normalizing a normalized string is the identity
    df.select((TextOps.normalizeText(TextOps.normalizeText(col("text")))
        === TextOps.normalizeText(col("text"))).as("ok"))
      .collect().forall(_.getBoolean(0)) shouldBe true
  }
}
