package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-3 training-data pipeline operators: deterministic
  * sampling, decontamination, sessionization, token packing, and the
  * bloom-filter semi join.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  val docsDir = "/root/testdata/sf0.01"
  lazy val documents = spark.read.parquet(s"$docsDir/documents.parquet").cache()

  test("bloomSemiJoin == plain semi join (false positives removed exactly)") {
    val big = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
    val small = (1L to 5000L).filter(_ % 13 == 0).map(Tuple1(_)).toDF("sk")
    val got = Joins.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 1000L, fpp = 0.1)
      .select("k").as[Long].collect().sorted
    val want = big.join(small, col("k") === col("sk"), "semi")
      .select("k").as[Long].collect().sorted
    got shouldBe want
    want.length shouldBe 384 // 5000/13
  }

  test("heavyHitters == plain GROUP BY HAVING, including under a coarse sketch") {
    // Zipf-ish key distribution: key i appears ~ 3000/i times
    val rows = (1 to 300).flatMap(i => Seq.fill(3000 / i)(s"k$i")).toDF("k")
    val want = rows.groupBy("k").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 100)
      .as[(String, Long)].collect().sortBy(_._1)
    val got = Sketch.heavyHitters(rows, "k", minCount = 100)
      .as[(String, Long)].collect().sortBy(_._1)
    got shouldBe want
    // a deliberately coarse sketch (heavy over-counting) must still be exact:
    // over-counting only adds false CANDIDATES, which the re-count removes
    val coarse = Sketch.heavyHitters(rows, "k", minCount = 100,
      eps = 0.05, confidence = 0.7)
      .as[(String, Long)].collect().sortBy(_._1)
    coarse shouldBe want
    // long key type goes through the string cast path
    val longKeys = (1 to 50).flatMap(i => Seq.fill(i * 4)(i.toLong)).toDF("k")
    val gotL = Sketch.heavyHitters(longKeys, "k", minCount = 100)
      .select(col("k").cast("long"), col("cnt"))
      .as[(Long, Long)].collect().sortBy(_._1)
    gotL shouldBe longKeys.groupBy("k").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 100).as[(Long, Long)].collect().sortBy(_._1)
  }

  test("stratifiedHashSample: deterministic, a subset, near the target rates") {
    val s1 = Sampling.stratifiedHashSample(documents, "lang", "doc_id",
      Map("en" -> 0.1), defaultRate = 0.5)
    val s2 = Sampling.stratifiedHashSample(documents, "lang", "doc_id",
      Map("en" -> 0.1), defaultRate = 0.5)
    val ids1 = s1.select("doc_id").as[Long].collect().sorted
    ids1 shouldBe s2.select("doc_id").as[Long].collect().sorted
    // per-stratum realized rate within a loose binomial tolerance
    val byLang = documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / byLang("en")
    assert(enRate > 0.02 && enRate < 0.25, s"en rate $enRate")
    byLang.keys.filterNot(_ == "en").foreach { l =>
      val r = kept.getOrElse(l, 0L).toDouble / byLang(l)
      assert(r > 0.25 && r < 0.75, s"$l rate $r")
    }
  }

  test("weightedHashSample: deterministic subset, inclusion tracks weight") {
    val rows = (1L to 20000L).map(i => (i, if (i % 2 == 0) 4.0 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedHashSample(rows, "id", "w", rate = 0.1)
    val s2 = Sampling.weightedHashSample(rows, "id", "w", rate = 0.1)
    val got = s1.select("id").as[Long].collect().sorted
    got shouldBe s2.select("id").as[Long].collect().sorted // deterministic
    val heavy = s1.where(col("w") === 4.0).count().toDouble / 10000
    val light = s1.where(col("w") === 1.0).count().toDouble / 10000
    heavy shouldBe 0.4 +- 0.03 // P = w*rate
    light shouldBe 0.1 +- 0.02
    // weight >= 1/rate ⇒ certainty
    Sampling.weightedHashSample(rows, "id", "w", rate = 1.0).count() shouldBe 20000L
  }

  test("trainEvalSplit: disjoint, covering, deterministic") {
    val (train, eval) = Sampling.trainEvalSplit(documents, "doc_id", 0.2)
    val t = train.select("doc_id").as[Long].collect().toSet
    val e = eval.select("doc_id").as[Long].collect().toSet
    t.intersect(e) shouldBe empty
    (t ++ e).size.toLong shouldBe documents.count()
  }

  test("contaminationPairs: finds planted overlap, ignores disjoint docs") {
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val corpus = Seq(
      (10L, "prefix words alpha beta gamma delta epsilon zeta suffix"),
      (11L, "alpha beta gamma delta epsilon"), // only 5 tokens < n+? shares 5-gram
      (12L, "completely different content with no shared phrases at all"))
      .toDF("id", "text")
    val got = Corpus.contaminationPairs(corpus, evalSet, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 10 shares the 5-grams of the full 6-token eval doc that survive its
    // own shingling; doc 11 is exactly "alpha..epsilon" = one shared 5-gram
    assert(got.exists(p => p._1 == 10L && p._2 == 1L))
    assert(got.exists(p => p._1 == 11L && p._2 == 1L && p._3 == 1L))
    assert(!got.exists(_._1 == 12L))
  }

  test("connectedComponents distributed path: string keys (ANSI-safe) and long chains") {
    // string node ids through the label-propagation loop — the old
    // sum(cast(rep as decimal)) convergence check threw under ANSI here
    val sEdges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"),
      ("m", "n"), ("n", "o")).toDF("id1", "id2")
    val sGot = Dedup.connectedComponents(sEdges, localEdgeLimit = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    Seq("a", "b", "c", "d").foreach(n => sGot(n) shouldBe "a")
    Seq("x", "y").foreach(n => sGot(n) shouldBe "x")
    Seq("m", "n", "o").foreach(n => sGot(n) shouldBe "m")
    // a 60-edge chain (diameter 60 > the old maxIter 20): pointer jumping
    // must converge it within the default 25 rounds
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id1", "id2")
    val cGot = Dedup.connectedComponents(chain, localEdgeLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    cGot.length shouldBe 61
    cGot.foreach { case (_, rep) => rep shouldBe 0L }
  }

  test("saltedJoin == plain join; saltedSum == plain sum") {
    val rnd = new scala.util.Random(3)
    // skewed: 80% of rows share key 0
    val large = (1 to 2000).map { i =>
      (if (rnd.nextDouble() < 0.8) 0L else rnd.nextInt(20).toLong, i.toLong)
    }.toDF("k", "v")
    val small = (0L to 19L).map(k => (k, s"name$k")).toDF("k", "name")
    val gotJ = Skew.saltedJoin(large, small, Seq("k"), salt = 4)
      .select("k", "v", "name").collect().map(_.toString).sorted
    val wantJ = large.join(small, Seq("k"))
      .select("k", "v", "name").collect().map(_.toString).sorted
    gotJ shouldBe wantJ
    val gotS = Skew.saltedSum(large, Seq("k"), "v", salt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wantS = large.groupBy("k").agg(sum("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    gotS shouldBe wantS
  }

  test("resampleLastKnown: grid coverage, forward fill, latest-per-bucket pick") {
    val ev = Seq(
      // key 1: buckets 0 (two obs, latest t=9 v=5.0), gap at 1-2, obs at 3
      (1L, 4L, 1.0), (1L, 9L, 5.0), (1L, 31L, 7.0),
      // key 2: single bucket
      (2L, 100L, 2.5),
      // key 1 bucket 0 exact-ts tie at t=9: max value wins -> 5.0 stays
      (1L, 9L, 4.0))
      .toDF("k", "t", "v")
    val got = Sessions.resampleLastKnown(ev, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    got shouldBe Array(
      (1L, 0L, 5.0, 1), (1L, 1L, 5.0, 0), (1L, 2L, 5.0, 0), (1L, 3L, 7.0, 1),
      (2L, 10L, 2.5, 1))
  }

  test("gapSessions/sessionStats == brute-force reference") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 500).map { _ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong)
    }.toDF("user_id", "ts")
    val got = Sessions.sessionStats(events, "user_id", "ts", gap = 300L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // brute force: sort each user's timestamps, split on gap > 300
    val want = events.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).flatMap { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = scala.collection.mutable.ArrayBuffer[Vector[Long]]()
        ts.foreach { t =>
          if (sessions.nonEmpty && t - sessions.last.last <= 300L)
            sessions(sessions.size - 1) = sessions.last :+ t
          else sessions += Vector(t)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong, s.head, s.last, s.last - s.head, s.size.toLong)
        }
      }.toSet
    got shouldBe want
  }

  test("bigram LM: repeated corpus phrasing scores above scrambled text") {
    val docs = (Seq.fill(20)("the quick brown fox jumps over the lazy dog")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (99L, "dog the brown lazy jumps quick fox over the"))
      .toDF("id", "text")
    val scores = LangModel.bigramLogProb(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // the template doc's bigrams dominate the corpus → high conditional
    // probability; the scrambled doc shares tokens but not transitions
    scores(0L) should be > scores(99L)
    // near ln(1) except "the" → {quick, lazy} branching (2·ln ½ / 8 ≈ −0.17)
    scores(0L) should be > -0.3
  }

  test("int8 quantization: bounded lane error, top-k survives quantization") {
    val emb = spark.read.parquet(s"$docsDir/embeddings.parquet").cache()
    // per-lane reconstruction error ≤ scale/2
    val bad = Ann.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), Seq("id"))
      .select(col("scale"),
        aggregate(zip_with(col("qv").cast("array<double>"), col("v"),
          (q, x) => abs(q * col("scale") - x)), lit(0.0),
          (a, e) => greatest(a, e)).as("maxerr"))
      .where(col("maxerr") > col("scale") * 0.5 + lit(1e-12)).count()
    bad shouldBe 0L
    // quantized brute top-10 overlaps the exact top-10 heavily
    val qset = emb.where(col("vec_id") < 5)
    val exact = Ann.bruteTopK(emb, qset, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Ann.bruteTopKInt8(emb, qset, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.intersect(quant).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized top-k overlap $overlap")
  }

  test("tokenStreamBins == brute-force exclusive-cumsum binning") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 400L), ("a", 3L, 50L), ("a", 4L, 600L),
      ("b", 1L, 512L), ("b", 2L, 1L))
      .toDF("shard", "id", "n_tok")
    val got = Packing.tokenStreamBins(docs, "shard", "id", "n_tok", 512L)
      .select("shard", "id", "bin")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    got(("a", 1L)) shouldBe 0L // cum 0
    got(("a", 2L)) shouldBe 0L // cum 100
    got(("a", 3L)) shouldBe 0L // cum 500
    got(("a", 4L)) shouldBe 1L // cum 550
    got(("b", 1L)) shouldBe 0L // cum 0
    got(("b", 2L)) shouldBe 1L // cum 512 → exactly at the boundary
  }

  test("slidingChunks: overlap layout, short-doc truncation, full coverage") {
    val doc = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("id", "text")
    val chunks = df.select(col("id"),
      explode(TextOps.slidingChunks(col("text"), width = 20, stride = 10)).as("c"))
      .select(col("id"), col("c.chunk_idx"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 25 tokens → floor((25-20+10)/10) = 1 full window: tokens 1-20
    chunks.filter(_._1 == 1L).map(_._2).sorted shouldBe Seq(0L)
    chunks.find(c => c._1 == 1L && c._2 == 0L).get._3 shouldBe
      (1 to 20).map(i => s"w$i").mkString(" ")
    // short doc → one truncated chunk covering the whole doc
    chunks.filter(_._1 == 2L) shouldBe Array((2L, 0L, "a b c"))
    // stride layout: 35 tokens → windows at 0 and 10
    val d3 = Seq((3L, (1 to 35).map(i => s"w$i").mkString(" "))).toDF("id", "text")
    val c3 = d3.select(explode(TextOps.slidingChunks(col("text"), 20, 10)).as("c"))
      .select(col("c.chunk_idx"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    c3.keySet shouldBe Set(0L, 1L)
    c3(1L) shouldBe (11 to 30).map(i => s"w$i").mkString(" ")
  }

  test("charEntropy: closed-form values and HOF equivalence") {
    import graft.functions.TextFns
    val df = Seq("aabb", "abcd", "aaaa", "aab").toDF("t")
    val got = df.select(TextFns.charEntropy(col("t"))).as[Double].collect()
    got(0) shouldBe 1.0 +- 1e-12              // two symbols, equal p
    got(1) shouldBe 2.0 +- 1e-12              // four symbols, equal p
    got(2) shouldBe 0.0 +- 1e-12              // single symbol
    val p = 2.0 / 3
    got(3) shouldBe -(p * math.log(p) / math.log(2) +
      (1 - p) * math.log(1 - p) / math.log(2)) +- 1e-12
    // equivalence with the explode-and-aggregate form on real docs
    import org.apache.spark.sql.expressions.Window
    val docs = documents.limit(50).select(col("doc_id"), col("text"))
    val native = docs.select(col("doc_id"),
      TextFns.charEntropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = docs.select(col("doc_id"),
      explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= "")
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over(Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg((-sum((col("n") / col("tot")) * log2(col("n") / col("tot")))).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hof.keySet shouldBe native.keySet
    hof.foreach { case (id, e) => native(id) shouldBe e +- 1e-9 }
  }
}
