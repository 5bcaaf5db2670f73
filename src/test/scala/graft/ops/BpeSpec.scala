package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.BpeFns

/** Closed-form BPE fixture (the gate's learning is corpus-dependent; this
  * pins the algorithm): corpus = "aaab"×3 ++ "aab"×2.
  *
  * Hand derivation:
  *   round 1: pairs (a,a): 3·2 + 2·1 = 8, (a,b): 3+2 = 5 → merge (a,a)
  *   round 2: aaab=[aa,a,b], aab=[aa,b] → (aa,a):3, (a,b):3, (aa,b):2;
  *            count tie 3 broken by (l,r): "a" < "aa" → merge (a,b)
  *   round 3: aaab=[aa,ab], aab=[aa,b] → (aa,ab):3, (aa,b):2 → merge (aa,ab)
  *   round 4: aaab single-token (drops out) → (aa,b):2 ≥ minCount → merge
  *   round 5: nothing left with ≥2 symbols → stop
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture =
    (Seq.fill(3)("aaab") ++ Seq.fill(2)("aab")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("learnMerges reproduces the closed-form merge sequence, ties lexicographic") {
    Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 3) shouldBe
      Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    // unbounded: one more rule fires, then the vocab runs dry (early stop)
    Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 10) shouldBe
      Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b"))
    // minCount stops the tail rule whose count is only 2
    Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 10, minCount = 3) shouldBe
      Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
  }

  test("batched merge rounds == sequential rounds (closed-form fixture)") {
    // the fixture's pairs all interact (shared a/aa/b symbols), so batching
    // must degenerate to near-sequential acceptance and still agree exactly
    val seq1 = Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 10,
      batchLimit = 1)
    val batched = Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 10,
      batchLimit = 64)
    batched shouldBe seq1
  }

  test("batched merge rounds == sequential rounds (real text, 200 merges)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seq1 = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 200,
      batchLimit = 1)
    val batched = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 200)
    batched shouldBe seq1
  }

  test("batched merges handle the self-pair offspring hazard") {
    // 'b b b b ...' runs: merging (b,b) spawns (bb,bb) with up to half the
    // count — a naive symbol-disjoint batch would also accept a weaker
    // disjoint pair (x,y) that sequential BPE ranks BELOW the offspring
    val docs = (Seq.fill(8)("b" * 9) ++ Seq.fill(3)("xy")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val seq1 = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 6,
      batchLimit = 1)
    val batched = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 6)
    batched shouldBe seq1
  }

  test("merge pass: leftmost, non-overlapping, continue-after-match") {
    val df = Seq(
      (1L, Seq("a", "a", "a", "a")),
      (2L, Seq("a", "a", "a")),
      (3L, Seq("x", "a", "a", "y"))).toDF("id", "syms")
    val out = df.select(col("id"),
        BpeFns.mergePassNative(col("syms"), "a", "a").as("syms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out(1L) shouldBe Seq("aa", "aa") // NOT [aa, a, a]: scan continues past merge
    out(2L) shouldBe Seq("aa", "a")
    out(3L) shouldBe Seq("x", "aa", "y")
  }

  test("encode applies rules once each in rank order; equals the DuckDB-replace semantics") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val words = Seq("aaab", "aab", "aaba", "aaaa", "b", "").toDF("word")
    val enc = Bpe.encodeVocab(words, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    enc("aaab") shouldBe Seq("aaab")
    enc("aab") shouldBe Seq("aa", "b")
    enc("aaba") shouldBe Seq("aa", "b", "a")
    enc("aaaa") shouldBe Seq("aa", "aa") // the [a,a,a,a] continue-after-match case
    enc("b") shouldBe Seq("b")
    enc("") shouldBe Seq.empty
  }

  test("docTokenCounts: per-doc sums over occurrences, zero-word docs kept at 0") {
    val docs = Seq(
      (1L, "aaab aab aaab"), // 1 + 2 + 1 = 4 under the 3-rule table
      (2L, "AAAB, aaba!"),   // lowercase + punctuation split: 1 + 3 = 4
      (3L, "...")            // no [a-z0-9] word at all
    ).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = Bpe.docTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 4L, 2L -> 4L, 3L -> 0L)
  }

  test("tokenFreq counts token occurrences corpus-wide with deterministic order") {
    val docs = Seq((1L, "aaab aab"), (2L, "aab b")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    // tokens: aaab→[aaab]; aab→[aa,b] ×2; b→[b]
    val got = Bpe.tokenFreq(docs, "doc_id", "text", merges, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got shouldBe Seq(("b", 3L), ("aa", 2L), ("aaab", 1L))
  }

  test("encoding is lossless: concatenating tokens reproduces the word, no empty tokens") {
    val merges = Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 4)
    val flat = merges.flatMap(p => Seq(p._1, p._2))
      .map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray
    val alphabet = "ab01".toCharArray
    // every word over {a,b,0,1} up to length 5 (exhaustive) + seeded longer
    val short = (0 to 5).flatMap(len =>
      Seq.fill(len)(alphabet.toSeq).foldLeft(Seq("")) {
        (acc, cs) => acc.flatMap(p => cs.map(c => p + c))
      })
    val rnd = new scala.util.Random(7)
    val long = Seq.fill(200)(
      (0 until (6 + rnd.nextInt(18)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    (short ++ long).foreach { w =>
      val toks = graft.functions.BpeUtil.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), flat)
      val strs = (0 until toks.numElements())
        .map(i => toks.getUTF8String(i).toString)
      withClue(s"word: '$w'") {
        strs.mkString shouldBe w // lossless
        strs.foreach(_ should not be empty)
      }
    }
  }

  test("vocabulary: alphabet first (sorted), merges in rank order, duplicates keep lowest id") {
    val docs = Seq((1L, "aaab aab b")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    Bpe.vocabulary(docs, "doc_id", "text", merges) shouldBe
      Seq(("a", 0), ("b", 1), ("aa", 2), ("ab", 3), ("aaab", 4))
    // duplicate merged string: (a,ab) and (aa,b) both yield "aab" — every
    // candidate occupies a slot, the duplicate keeps the LOWER id
    val dup = Seq(("a", "a"), ("a", "ab"), ("aa", "b"))
    Bpe.vocabulary(docs, "doc_id", "text", dup) shouldBe
      Seq(("a", 0), ("b", 1), ("aa", 2), ("aab", 3)) // id 4 slot consumed, hidden
    // id summaries compose encode and vocabulary: "aaab aab b" under the
    // 3-rule table → [aaab] [aa, b] [b] → ids [4] [2, 1] [1]
    val got = Bpe.docTokenIds(docs, "doc_id", "text", merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got shouldBe Array((1L, 4L, 8L, 1L, 4L))
  }

  test("learned merges survive a persist/load round-trip in rank order") {
    val merges = Bpe.learnMerges(fixture, "doc_id", "text", numMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.mergesDf(spark, merges).write.parquet(s"$dir/merges")
    Bpe.loadMerges(spark, s"$dir/merges") shouldBe merges
  }

  // ---- byte-level mode ----

  private def byteFixture =
    // "ss" → UTF-8 73 73 dominates; "ß" (C3 9F) and "é" (C3 A9) share the
    // C3 lead byte so multi-byte merges and shared prefixes both occur
    (Seq.fill(4)("ssß") ++ Seq.fill(3)("ssé") ++ Seq.fill(2)("Straße"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("byte mode: closed-form merge sequence over UTF-8 hex symbols") {
    // occurrences: ssß=4 [73 73 C3 9F], ssé=3 [73 73 C3 A9],
    //              Straße=2 [53 74 72 61 C3 9F 65]
    // round 1: (73,73) 4+3=7 wins (others ≤ 6)
    val m = Bpe.learnMerges(byteFixture, "doc_id", "text", numMerges = 2,
      byteLevel = true)
    m.head shouldBe ("73", "73")
    // (C3,9F): 4+2=6 beats (7373,C3): 7? no — (7373,C3) count is 7.
    // pairs after r1: ssß=[7373,C3,9F], ssé=[7373,C3,A9] → (7373,C3)=7
    m(1) shouldBe ("7373", "C3")
  }

  test("byte mode: total fallback — any script tokenizes, counts = UTF-8 bytes with no merges") {
    val docs = Seq((0L, "東京 мир"), (1L, "𝄞 clef")).toDF("doc_id", "text")
    val got = Bpe.docTokenCounts(docs, "doc_id", "text", Seq.empty,
      byteLevel = true).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 東京 = 2×3 bytes, мир = 3×2 bytes → 12; 𝄞 = 4 bytes, clef = 4 → 8
    got shouldBe Array((0L, 12L), (1L, 8L))
  }

  test("byte mode: encoding is lossless — unhexing concatenated tokens reproduces the word") {
    val merges = Bpe.learnMerges(byteFixture, "doc_id", "text",
      numMerges = 6, byteLevel = true)
    val enc = Bpe.encodeVocab(
      Bpe.words(byteFixture, "doc_id", "text", byteLevel = true)
        .select("word").distinct(),
      merges, byteLevel = true)
      .select(col("word"), concat_ws("", col("toks")).as("hexcat"))
      .collect()
    enc should not be empty
    enc.foreach { r =>
      val bytes = r.getString(1).grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      new String(bytes, "UTF-8") shouldBe r.getString(0)
    }
  }

  test("byte mode: vocabulary = sorted byte alphabet first, merges in rank order") {
    val merges = Bpe.learnMerges(byteFixture, "doc_id", "text", numMerges = 2,
      byteLevel = true)
    val vocab = Bpe.vocabulary(byteFixture, "doc_id", "text", merges,
      byteLevel = true)
    // distinct bytes of {ssß, ssé, Straße}: S t r a e s ß é = 53 74 72 61
    // 65 73 C3 9F A9 — hex-string sort puts digit-leading pairs first
    vocab.take(9).map(_._1) shouldBe
      Seq("53", "61", "65", "72", "73", "74", "9F", "A9", "C3")
    vocab.take(9).map(_._2) shouldBe (0 until 9)
    vocab.drop(9).map(_._1) shouldBe merges.map(p => p._1 + p._2)
    // ids bounded by alphabet (≤256) + numMerges — never the corpus
    vocab.length shouldBe 9 + merges.length
  }

  test("byte mode: case and script are preserved (no lowercasing of the byte stream)") {
    val docs = Seq((0L, "AB ab")).toDF("doc_id", "text")
    val words = Bpe.words(docs, "doc_id", "text", byteLevel = true)
      .select("word").collect().map(_.getString(0)).sorted
    words shouldBe Array("AB", "ab")
  }
}
