package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property gates for the ops that have no DuckDB oracle (hash-based LSH,
  * simhash, IVF, multimodal plumbing) plus spot checks for the text ops.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  val docsDir = "/root/testdata/sf0.01"
  lazy val documents = spark.read.parquet(s"$docsDir/documents.parquet").cache()
  lazy val embeddings = spark.read.parquet(s"$docsDir/embeddings.parquet").cache()

  test("incremental LSH pairs == full exact pairs restricted to the delta") {
    import graft.functions.TextFns
    val corpus = documents.where(col("doc_id") % 3 =!= 0)
    val index = Dedup.minhashSignatures(
      corpus.select(col("doc_id").as("id"),
        TextFns.wordShinglesNative(col("text"), 3).as("grams")),
      "id", "grams", 64)
    val delta = documents.where(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id"))
    val incr = Dedup.incrementalLshPairs(documents, "doc_id", "text", index, delta)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.jaccardPairs(documents, "doc_id", "text", 3, 0.5)
      .where(col("id1") % 3 === 0 || col("id2") % 3 === 0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    incr shouldBe full
    incr.size should be > 3
  }

  test("minhash LSH pairs == exact jaccard pairs on testdata (verified candidates)") {
    val exact = Dedup.jaccardPairs(documents, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(documents, "doc_id", "text")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe exact // precision exact by construction; recall by S-curve
    exact.size should be > 10
  }

  test("native one-pass minhash signature == explode+aggregate signatures") {
    import graft.functions.TextFns
    val docs = documents.limit(100).select(col("doc_id").as("id"),
      TextFns.wordShinglesNative(col("text"), 3).as("grams"))
    val agg = Dedup.minhashSignatures(docs, "id", "grams", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val nat = docs.select(col("id"),
        TextFns.minhashSigNative(col("grams"), 64).as("sig"))
      .where(org.apache.spark.sql.functions.size(col("sig")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    nat shouldBe agg
  }

  test("simhash: recalls most true near-dups within hamming bound") {
    val pairs = Dedup.simhashPairs(documents, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    pairs.values.foreach(_ should be <= 3)
    val exact = Dedup.jaccardPairs(documents, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash is order-insensitive and precision-lossy on a tiny vocabulary;
    // the gate is recall of true near-dups (18/25 on this corpus)
    val recall = pairs.keySet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"simhash recall $recall")
  }

  test("unicode normalization: NFC composes, accent fold strips marks, idempotent") {
    import graft.functions.TextFns
    // "café" as NFD (e + combining acute) vs NFC (precomposed é)
    val nfd = "café"
    val nfc = "caf\u00e9"
    val df = Seq((1L, nfd), (2L, nfc), (3L, "日本語"), (4L, "plain")).toDF("id", "text")
    val out = df.select(col("id"), TextFns.nfc(col("text")).as("n"),
      TextFns.foldAccents(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    out(1L)._1 shouldBe nfc // NFD input composes to NFC
    out(2L)._1 shouldBe nfc // already-NFC unchanged
    out(1L)._2 shouldBe "cafe"
    out(2L)._2 shouldBe "cafe"
    out(3L)._1 shouldBe "日本語"
    out(4L)._2 shouldBe "plain"
    // the pre-dedup use: visually identical strings hash identically after NFC
    val hashes = df.where(col("id") <= 2)
      .select(xxhash64(TextFns.nfc(col("text")))).collect().map(_.getLong(0))
    hashes(0) shouldBe hashes(1)
    // idempotence
    df.select((TextFns.nfc(TextFns.nfc(col("text"))) === TextFns.nfc(col("text")))
      .as("ok")).collect().forall(_.getBoolean(0)) shouldBe true
  }

  test("connectedComponents == reference union-find on random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val edges = (1 to 120).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        // rep = min node id in component
        val root = find(v.toInt)
        v -> nodes.filter(u => find(u.toInt) == root).min
      }.toMap
      val got = Dedup.connectedComponents(edges.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed $seed: ") { got shouldBe expected }
    }
    // string-keyed graphs (the byte-budgeted local path) agree with the
    // distributed label-propagation path on the same long-id edges
    val sEdges = Seq(("doc-" + "x" * 200 + "-1", "doc-" + "x" * 200 + "-2"),
      ("doc-" + "x" * 200 + "-2", "doc-" + "x" * 200 + "-3"),
      ("a", "b")).toDF("id1", "id2")
    val local = Dedup.connectedComponents(sEdges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = Dedup.connectedComponents(sEdges, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    local shouldBe dist
    local("b") shouldBe "a"
  }

  test("native shingle/simhash expressions == HOF reference forms") {
    import graft.functions.TextFns
    // shingles: same multiset of (id, gram) pairs as the portable HOF form
    val hof = documents.select(col("doc_id"),
      explode(Dedup.wordNgrams(TextOps.tokens(col("text")), 3)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val native = documents.select(col("doc_id"),
      explode(TextFns.wordShinglesNative(col("text"), 3)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    native shouldBe hof
    // simhash: identical 60-bit signatures
    val hofSim = documents.select(col("doc_id"), Dedup.simhash60(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val natSim = documents.select(col("doc_id"), TextFns.simhashNative(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    natSim shouldBe hofSim
    // split edge cases: trailing space, empty string, double space
    val edge = Seq("a b c ", "", "a  b", "x").toDF("text")
    val h = edge.select(Dedup.simhash60(col("text"))).collect().map(_.getLong(0))
    val nv = edge.select(TextFns.simhashNative(col("text"))).collect().map(_.getLong(0))
    nv.toSeq shouldBe h.toSeq
    val hg = edge.select(Dedup.wordNgrams(TextOps.tokens(col("text")), 2))
      .collect().map(_.getSeq[String](0))
    val ng = edge.select(TextFns.wordShinglesNative(col("text"), 2))
      .collect().map(_.getSeq[String](0))
    ng.toSeq shouldBe hg.toSeq
    // char shingles: native == HOF on the corpus + unicode edge cases
    val hc = documents.select(col("doc_id"), TextOps.charNgrams(col("text"), 5))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    val nc = documents.select(col("doc_id"), TextFns.charShinglesNative(col("text"), 5))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    nc shouldBe hc
    val uni = Seq("héllo wörld", "日本語のテキスト", "ab").toDF("text")
    val hu = uni.select(TextOps.charNgrams(col("text"), 3)).collect().map(_.getSeq[String](0))
    val nu = uni.select(TextFns.charShinglesNative(col("text"), 3)).collect().map(_.getSeq[String](0))
    nu.toSeq shouldBe hu.toSeq
  }

  test("char-shingle LSH == exact prefix-filtered char jaccard at 0.8") {
    val exact = Dedup.charJaccardPairsPrefix(documents, "doc_id", "text", 5, 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.charMinhashLshPairs(documents, "doc_id", "text", 5, threshold = 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe exact
    exact.size should be > 10
  }

  test("prefix-filtered jaccard == naive all-pairs jaccard at several thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val naive = Dedup.jaccardPairs(documents, "doc_id", "text", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPairsPrefix(documents, "doc_id", "text", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"threshold $t: ") { pref shouldBe naive }
    }
  }

  test("hot-shingle cap preserves high-jaccard pairs") {
    val capped = Dedup.jaccardPairs(documents, "doc_id", "text", 3, 0.5,
      maxShingleDocs = Some(100)).select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(documents, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no shingle in this corpus is shared by >100 docs, so cap is a no-op here
    capped shouldBe exact
  }

  test("LSH bucketed cosine pairs: planted near-dups recalled, precision exact") {
    // plant 10 near-identical pairs (cos > 0.99) among 100 random vectors —
    // the regime multi-table hyperplane LSH is designed for
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 100).map(i => (i.toLong, vec().toSeq))
    val dups = (0 until 10).map { i =>
      val v = base(i)._2.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
      ((100 + i).toLong, v)
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val brute = Ann.cosinePairs(df, "vec_id", "embedding", 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshBucketPairs(df, "vec_id", "embedding", 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    brute.size should be >= 10
    assert(lsh.subsetOf(brute)) // verify step makes precision exact
    assert(lsh.size >= brute.size * 8 / 10, s"recall too low: ${lsh.size}/${brute.size}")
  }

  test("multi-probe LSH: superset of single-bucket candidates, recall up, precision exact") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 100).map(i => (i.toLong, vec().toSeq))
    val dups = (0 until 10).map { i =>
      val v = base(i)._2.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
      ((100 + i).toLong, v)
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val planes = Ann.lshPlanesFromDf(
      Ann.lshPlanesDf(spark, nTables = 4, bitsPerTable = 8, dim = 64))
    val brute = Ann.cosinePairs(df, "vec_id", "embedding", 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Ann.lshMultiProbePairs(df, "vec_id", "embedding", 0.9, planes)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // single-probe on the SAME 4 tables = pairs at hamming 0; multi-probe
    // additionally admits hamming 1, so its pair set must contain it
    val single = Ann.lshBucketPairs(df, "vec_id", "embedding", 0.9,
      nTables = 4, bitsPerTable = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi),
      s"multi-probe lost single-probe pairs: ${single -- multi}")
    assert(multi.subsetOf(brute)) // exact verify: precision 1.0
    assert(multi.size >= brute.size * 9 / 10,
      s"multi-probe recall too low: ${multi.size}/${brute.size}")
    // plane round-trip through the persistence shape is lossless
    planes.length shouldBe 4
    planes.foreach(_.length shouldBe 8)
    planes.foreach(_.foreach(_.length shouldBe 64))
  }

  test("IVF topk: exact rerank, recall vs brute above floor") {
    val qs = embeddings.where(col("vec_id") < 5)
    val brute = Ann.bruteTopK(embeddings, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(embeddings, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ivf.size shouldBe 50 // k rows per query regardless of probes
    assert(ivf.intersect(brute).size >= 25, // ≥50% recall at nprobe=4/nlist=16
      s"IVF recall ${ivf.intersect(brute).size}/50")
  }

  test("PQ topk: ADC recall vs brute above floor; codes are m small ints") {
    val qs = embeddings.where(col("vec_id") < 5)
    val brute = Ann.bruteTopK(embeddings, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ann.pqTopK(embeddings, qs, "vec_id", "embedding", 10,
      m = 8, kcent = 32)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pq.size shouldBe 50
    assert(pq.intersect(brute).size >= 25, // ≥50% recall at m=8,k=32
      s"PQ recall ${pq.intersect(brute).size}/50")
    // encode invariants: m codes in [0, k), reconstruction norm positive
    val cb = Ann.pqTrain(embeddings, "embedding", m = 8, k = 32)
    val enc = Ann.pqEncode(embeddings, "vec_id", "embedding", cb).collect()
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      codes.length shouldBe 8
      codes.foreach(c => assert(c >= 0 && c < 32))
      r.getDouble(2) should be > 0.0
    }
    // native codegen encode == the HOF reference form (rounded + exact), and
    // the precomputed-codes serving path == the encode-per-call path
    for (roundTo <- Seq(None, Some(6))) {
      val nat = Ann.pqEncode(embeddings, "vec_id", "embedding", cb, roundTo)
        .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getDouble(2))).toMap
      val hof = Ann.pqEncodeHof(embeddings, "vec_id", "embedding", cb, roundTo)
        .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getDouble(2))).toMap
      nat shouldBe hof
    }
    val precomputed = Ann.pqEncode(embeddings, "vec_id", "embedding", cb, Some(6))
    val viaCodes = Ann.pqTopK(embeddings, qs, "vec_id", "embedding", 10,
      codebooksOpt = Some(cb), rankOnRoundedTo = Some(6),
      codesOpt = Some(precomputed))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Ann.pqTopK(embeddings, qs, "vec_id", "embedding", 10,
      codebooksOpt = Some(cb), rankOnRoundedTo = Some(6))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    viaCodes shouldBe direct
  }

  test("text ops: deterministic, sane ranges; langid picks a profile language") {
    val stats = documents.select(
      TextOps.tokenCount(col("text")).as("nt"),
      TextOps.stopRatio(col("text")).as("sr"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.fingerprint(col("text")).as("fp"),
      TextOps.langId(col("text")).as("lang")).collect()
    stats.foreach { r =>
      r.getInt(0) should be > 0
      r.getDouble(1) should (be >= 0.0 and be <= 1.0)
      r.getDouble(2) should (be >= 0.0 and be <= 1.0)
      r.getLong(3) should (be >= 0L and be < 1000000007L)
      Seq("en", "fr", "es", "de", "zh") should contain(r.getString(4))
    }
    // fingerprint: permutation-sensitive (rolling), equal strings equal fps
    val fps = Seq("a b c", "a b c", "c b a").toDF("text")
      .select(TextOps.fingerprint(col("text"))).collect().map(_.getLong(0))
    fps(0) shouldBe fps(1)
    fps(0) should not be fps(2)
  }

  test("char-shingle jaccard finds the same near-dup pairs as word shingles") {
    // char shingles are the tokenizer-free path; on THIS whitespace corpus
    // they must agree with the word-shingle result. (Kept out of the sf0.1
    // gate: 5000 low-entropy docs make hot char-4-grams quadratic — the
    // word-shingle query is the gate; this is the semantic check.)
    val grams = documents.select(col("doc_id").as("id"),
      TextOps.charNgrams(col("text"), 4).as("grams"))
    val ex = grams.select(col("id"), explode(col("grams")).as("g"))
    val inter = ex.select(col("g"), col("id").as("id1"))
      .join(ex.select(col("g"), col("id").as("id2")), Seq("g"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n"))
    val sizes = grams.select(col("id"),
      org.apache.spark.sql.functions.size(col("grams")).as("sz"))
    val charPairs = inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), "id2")
      .where(col("n").cast("double") / (col("sz1") + col("sz2") - col("n")) >= 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wordPairs = Dedup.jaccardPairs(documents, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    charPairs shouldBe wordPairs
  }

  test("exactByHash matches exact dedup; tfidf top terms are sane") {
    val byText = Dedup.exact(documents, Seq("text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byHash = Dedup.exactByHash(documents, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byHash shouldBe byText
    val top = TfIdf.topTerms(documents, "doc_id", "text", k = 3).collect()
    top.length shouldBe 3 * documents.count()
    top.foreach(r => r.getLong(2) should be <= 3L)
  }

  test("repetition ratio and PII redaction behave on known strings") {
    val df = Seq(
      (1L, "a b c a b c a b c"),          // heavy 3-gram repetition
      (2L, "one two three four five six"), // no repetition
      (3L, "ab"),                          // shorter than n → 0
      (4L, "mail me at jo.doe+x@test.org or call 044 123 456 789 now")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextOps.repetitionRatio(col("text"), 3).as("rep"),
      TextOps.redactPii(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    out(1L)._1 should be > 0.5 // 7 grams, 3 distinct
    out(2L)._1 shouldBe 0.0
    out(3L)._1 shouldBe 0.0
    out(4L)._2 shouldBe "mail me at <EMAIL> or call <PHONE> now"
  }

  test("salted join and salted aggregation equal their unsalted forms") {
    val large = (1 to 5000).map(i => (i % 3L, i.toDouble)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).groupBy("k", "name")
      .agg(sum("v").as("s")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val salted = Skew.saltedJoin(large, small, Seq("k"), salt = 8)
      .groupBy("k", "name").agg(sum("v").as("s")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    salted.keySet shouldBe plain.keySet
    salted.foreach { case (k, v) => v shouldBe plain(k) +- 1e-6 }
    val aggPlain = large.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val aggSalted = Skew.saltedSum(large, Seq("k"), "v", salt = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    aggSalted.keySet shouldBe aggPlain.keySet
    aggSalted.foreach { case (k, v) => v shouldBe aggPlain(k) +- 1e-6 }
  }

  test("multimodal: batched feature extraction is partition-parallel and deterministic") {
    val media = Multimodal.syntheticMedia(spark, 100).repartition(8)
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 10)
    f1.count() shouldBe 100
    val row = f1.where(col("media_id") === 7L).head()
    row.getSeq[Float](1).length shouldBe 16
    // determinism across runs and partitionings
    val f2 = Multimodal.extractFeatures(media.repartition(3), dim = 16, batchSize = 7)
    val a = f1.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = f2.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    a shouldBe b
    // frame sampling: stride arithmetic
    Multimodal.sampleFrames(media, stride = 8).count() shouldBe 100 * 4
  }

  test("multimodal: real PNG decode reproduces the closed-form pixel stats") {
    val media = Multimodal.syntheticMedia(spark, 30).repartition(5)
    val got = Multimodal.imageStats(media, batchSize = 7).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    got.size shouldBe 30
    for (i <- 0L until 30L) {
      val (w, h) = Multimodal.synthDims(i)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthPixel(i, x, y)
        sr += r; sg += g; sb += b
      }
      val n = (w.toLong * h).toDouble
      val (gw, gh, mr, mg, mb) = got(i)
      (gw, gh) shouldBe ((w, h))
      mr shouldBe (sr / n)
      mg shouldBe (sg / n)
      mb shouldBe (sb / n)
    }
  }

  test("meanVectors: closed-form centroids, layout-independent") {
    val df = Seq(
      (0L, Seq(1.0, 2.0, 3.0)), (0L, Seq(3.0, 4.0, 5.0)),
      (1L, Seq(10.0, 0.0, -2.0))
    ).toDF("label", "vec")
    val got = Ann.meanVectors(df, "label", "vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    got(0L) shouldBe Seq(2.0, 3.0, 4.0)
    got(1L) shouldBe Seq(10.0, 0.0, -2.0)
    Ann.meanVectors(df.repartition(5), "label", "vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap shouldBe got
  }

  test("multimodal: real WAV decode reproduces the closed-form sample stats") {
    val media = Multimodal.syntheticMedia(spark, 30, kind = "audio").repartition(5)
    val got = Multimodal.audioStats(media, batchSize = 7).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    got.size shouldBe 30
    for (i <- 0L until 30L) {
      val (rate, n) = Multimodal.synthAudioParams(i)
      val samples = Array.tabulate(n)(t => Multimodal.synthSample(i, t) / 32768.0)
      val (grate, gn, gdur, grms, gpeak) = got(i)
      (grate, gn) shouldBe ((rate, n))
      gdur shouldBe (n * 1000.0 / rate)
      grms shouldBe math.sqrt(samples.map(s => s * s).sum / n) +- 1e-12
      gpeak shouldBe samples.map(math.abs).max
    }
    // malformed payloads are rejected, not silently mis-parsed
    intercept[org.apache.spark.SparkException] {
      Multimodal.audioStats(
        Multimodal.syntheticMedia(spark, 3, kind = "video")).collect()
    }
  }

  test("multimodal: resize and resample reproduce closed-form transforms") {
    val imgs = Multimodal.syntheticMedia(spark, 20).repartition(4)
    val rz = Multimodal.resizeStats(imgs, tw = 8, th = 8, batchSize = 7)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    for (i <- 0L until 20L) {
      val (w, h) = Multimodal.synthDims(i)
      val px = for (y <- 0 until 8; x <- 0 until 8)
        yield Multimodal.synthPixel(i, x * w / 8, y * h / 8)
      val (gw, gh, mr, mg, mb) = rz(i)
      (gw, gh) shouldBe ((w, h))
      mr shouldBe (px.map(_._1.toLong).sum / 64.0) +- 1e-12
      mg shouldBe (px.map(_._2.toLong).sum / 64.0) +- 1e-12
      mb shouldBe (px.map(_._3.toLong).sum / 64.0) +- 1e-12
    }
    val auds = Multimodal.syntheticMedia(spark, 20, kind = "audio").repartition(4)
    val rs = Multimodal.resampleStats(auds, tgtRate = 4000, batchSize = 7)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toMap
    for (i <- 0L until 20L) {
      val (rate, n) = Multimodal.synthAudioParams(i)
      val nOut = (n.toLong * 4000 / rate).toInt
      val ss = (0 until nOut).map { j =>
        Multimodal.synthSample(i, (j.toLong * n / nOut).toInt) / 32768.0
      }
      val (gr, gn, gno, grms) = rs(i)
      (gr, gn, gno) shouldBe ((rate, n, nOut))
      grms shouldBe math.sqrt(ss.map(s => s * s).sum / nOut) +- 1e-12
    }
  }

  test("multimodal: real GIF video decode reproduces closed-form frame stats") {
    val media = Multimodal.syntheticMedia(spark, 30, kind = "video").repartition(5)
    val got = Multimodal.videoStats(media, batchSize = 7).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    got.size shouldBe 30
    for (i <- 0L until 30L) {
      val (w, h, nf) = Multimodal.synthVideoParams(i)
      val all = for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
        yield Multimodal.synthVideoPixel(i, f, x, y)
      val last = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.synthVideoPixel(i, nf - 1, x, y)
      val (gw, gh, gnf, gmean, glast) = got(i)
      (gw, gh, gnf) shouldBe ((w, h, nf)) // n_frames from CONTENT, not metadata
      gmean shouldBe (all.map(_.toLong).sum.toDouble / all.size) +- 1e-12
      glast shouldBe (last.map(_.toLong).sum.toDouble / last.size) +- 1e-12
    }
    // a single-frame still is a valid 1-frame container
    val still = Multimodal.decodeGifBatch(Seq(Multimodal.gifBytes(Seq({
      val img = new java.awt.image.BufferedImage(
        4, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img
    }))))
    still.head._3 shouldBe 1
    // non-container payloads are rejected
    intercept[org.apache.spark.SparkException] {
      Multimodal.videoStats(
        Multimodal.syntheticMedia(spark, 3, kind = "audio")).collect()
    }
  }

  test("multimodal: keyframe selection matches the closed-form SAD, frame 0 always kept") {
    val media = Multimodal.syntheticMedia(spark, 30, kind = "video")
      .repartition(5)
    def expectedMad(i: Long, f: Int): Double = {
      val (w, h, _) = Multimodal.synthVideoParams(i)
      var sad = 0L
      for (y <- 0 until h; x <- 0 until w)
        sad += math.abs(Multimodal.synthVideoPixel(i, f, x, y) -
          Multimodal.synthVideoPixel(i, f - 1, x, y))
      sad.toDouble / (w * h)
    }
    val got = Multimodal.keyframes(media, threshold = 68.0).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val expected = (0L until 30L).flatMap { i =>
      val (_, _, nf) = Multimodal.synthVideoParams(i)
      ((i, 0) -> 0.0) +: (1 until nf).flatMap { f =>
        val m = expectedMad(i, f)
        if (m > 68.0) Some((i, f) -> m) else None
      }
    }.toMap
    got shouldBe expected
    // both classes exist at this threshold (the gate isn't vacuous)
    expected.count(_._2 > 68.0) should be > 0
    (0L until 30L).map { i =>
      Multimodal.synthVideoParams(i)._3 - 1
    }.sum should be > expected.count(_._2 > 68.0)
    // threshold sweep: ∞ keeps only frame 0; -1 keeps every frame
    Multimodal.keyframes(media, threshold = Double.MaxValue).count() shouldBe 30L
    val total = (0L until 30L).map(i => Multimodal.synthVideoParams(i)._3).sum
    Multimodal.keyframes(media, threshold = -1.0).count() shouldBe total.toLong
  }

  test("multimodal: featurizer embeddings match the closed form and feed ANN end-to-end") {
    val dim = 8; val seed = 42L
    val media = Multimodal.syntheticMedia(spark, 40).repartition(6)
    val emb = Multimodal.imageEmbedding(media, dim = dim, seed = seed,
      batchSize = 7)
    // closed-form expectation: integer-exact projection of synthPixel
    def expected(i: Long): Array[Double] = {
      val (w, h) = Multimodal.synthDims(i)
      val acc = new Array[Long](dim)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthPixel(i, x, y)
        for (k <- 0 until dim)
          acc(k) += r * Multimodal.projWeight(k, x, y, 0, seed) +
            g * Multimodal.projWeight(k, x, y, 1, seed) +
            b * Multimodal.projWeight(k, x, y, 2, seed)
      }
      acc.map(_ / (48.0 * w * h))
    }
    val got = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.size shouldBe 40
    // integer accumulation + one division → EXACT equality, any partitioning
    for (i <- 0L until 40L) got(i) shouldBe expected(i)
    // end-to-end from raw payloads: the featurizer frame drives brute-force
    // ANN directly, and the neighbor sets equal the closed-form computation
    val queries = emb.where(col("media_id") < 4)
    val gotKnn = Ann.bruteTopK(emb, queries, "media_id", "embedding",
      k = 3, rankOnRoundedTo = Some(9)).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (q <- 0L until 4L) {
      val exp = (0L until 40L).filter(_ != q)
        .map(n => n -> BigDecimal(cos(expected(q), expected(n)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .sortBy { case (n, c) => (-c, n) }.take(3).map(_._1)
      (1 to 3).map(r => gotKnn((q, r))) shouldBe exp
    }
  }
}
