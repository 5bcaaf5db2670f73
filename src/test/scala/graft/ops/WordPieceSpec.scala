package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.WordPieceFns

/** WordPiece greedy longest-match encoding against closed-form
  * vocabularies — the properties the corpus-derived gate can't pin:
  * greedy-by-length vs BPE merge-rank divergence, whole-word [UNK]
  * fallback, continuation-form matching.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(word: String, vocab: Seq[String]): Seq[String] =
    Seq(word).toDF("word")
      .select(WordPieceFns.encodeNative(col("word"), vocab).as("t"))
      .collect().head.getSeq[String](0)

  test("greedy longest-match with continuation pieces") {
    val v = Seq("a", "b", "c", "ab", "abc", "##a", "##b", "##c", "##bc")
    enc("abc", v) shouldBe Seq("abc")
    enc("abca", v) shouldBe Seq("abc", "##a")
    // at pos 0 the longest start piece wins even when a shorter one would
    // lead to fewer total pieces downstream (greedy, not optimal)
    enc("abbc", v) shouldBe Seq("ab", "##bc")
  }

  test("whole word collapses to [UNK] when any position has no match") {
    val v = Seq("a", "b", "##a", "##b")
    enc("ab", v) shouldBe Seq("a", "##b")
    enc("axb", v) shouldBe Seq("[UNK]") // 'x' unreachable mid-word
    enc("xab", v) shouldBe Seq("[UNK]") // no start piece at pos 0
  }

  test("greedy disagrees with BPE merge-rank replay on the same vocabulary") {
    // merges learned rank order: (b,c) first, then (a,b). BPE encodes
    // "abc" as [a, bc] (rule (b,c) fires first); the WordPiece vocabulary
    // derived from those merges contains start piece "ab", so greedy
    // longest-match takes [ab, ##c] — same vocabulary, different encoder.
    val merges = Seq(("b", "c"), ("a", "b"))
    val vocab = WordPiece.vocabFromMerges(Seq("a", "b", "c"), merges)
    val bpe = Seq("abc").toDF("word")
      .select(graft.functions.BpeFns.encodeNative(col("word"), merges).as("t"))
      .collect().head.getSeq[String](0)
    bpe shouldBe Seq("a", "bc")
    enc("abc", vocab) shouldBe Seq("ab", "##c")
  }

  test("vocabFromMerges carries both piece forms and [UNK] exactly once") {
    val v = WordPiece.vocabFromMerges(Seq("a", "b"), Seq(("a", "b"), ("ab", "ab")))
    v.count(_ == "[UNK]") shouldBe 1
    v should contain allOf ("a", "##a", "ab", "##ab", "abab", "##abab")
    v.distinct.length shouldBe v.length
  }

  test("corpus encode: every in-alphabet word round-trips losslessly") {
    val docs = Seq((1L, "the quick brown fox abcabc"), (2L, "quick abcabc fox"))
      .toDF("doc_id", "text")
    val vocab = WordPiece.vocabFromMerges(
      WordPiece.corpusAlphabet(docs, "doc_id", "text"),
      Bpe.learnMerges(docs, "doc_id", "text", numMerges = 5, minCount = 2))
    val out = WordPiece.encodeVocab(
      Bpe.wordFreq(docs, "doc_id", "text").select(col("word")), vocab)
      .select(col("word"),
        array_join(transform(col("wp_toks"),
          t => regexp_replace(t, "^##", "")), "").as("joined"))
      .collect()
    out.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  test("codegen encode == driver-side reference walk, seeded random words and vocabs") {
    def refEncode(word: String, vocab: Set[String], maxCore: Int): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var pos = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos < word.length) {
        val hit = (math.min(maxCore, word.length - pos) to 1 by -1).iterator
          .map { l =>
            val core = word.substring(pos, pos + l)
            if (pos == 0) core else "##" + core
          }
          .find(vocab.contains)
        hit match {
          case None => return Seq("[UNK]")
          case Some(p) =>
            out += p
            pos += (if (p.startsWith("##")) p.length - 2 else p.length)
        }
      }
      out.toSeq
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcd"
      def randStr(n: Int) =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // vocab: a random subset of short strings in both forms (plus the
      // full alphabet at start form only — [UNK] must fire mid-word too)
      val pieces = (Seq("a", "b", "c") ++
        (1 to 12).map(_ => randStr(1 + rnd.nextInt(3)))).distinct
          .flatMap(s => Seq(s) ++
            (if (rnd.nextBoolean()) Seq("##" + s) else Seq.empty))
      val maxCore = pieces.map(p =>
        if (p.startsWith("##")) p.length - 2 else p.length).max
      val words = (1 to 60).map(_ => randStr(1 + rnd.nextInt(8))).distinct
      val got = words.toDF("word")
        .select(col("word"),
          graft.functions.WordPieceFns.encodeNative(col("word"), pieces).as("t"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      words.foreach { w =>
        got(w) shouldBe refEncode(w, pieces.toSet, maxCore)
      }
    }
  }

  test("optimal (Viterbi) segmentation: succeeds where greedy dead-ends; deterministic ties; min pieces") {
    def opt(word: String, vocab: Seq[String]): String =
      Seq(word).toDF("word")
        .select(WordPieceFns.encodeOptimalNative(col("word"), vocab).as("t"))
        .collect().head.getString(0)
    // the classic greedy failure: longest-first takes "ab", strands "c";
    // the optimal segmenter backtracks to "a ##bc"
    val v1 = Seq("a", "ab", "##bc")
    enc("abc", v1) shouldBe Seq("[UNK]")
    opt("abc", v1) shouldBe "a ##bc"
    // equal piece counts tie-break lexicographically — a DIFFERENT (but
    // equally sized) segmentation than greedy's longest-first
    val v2 = Seq("a", "ab", "##b", "##c", "##bc")
    enc("abc", v2) shouldBe Seq("ab", "##c")
    opt("abc", v2) shouldBe "a ##bc"
    // minimality: 2 pieces beat any 3+ decomposition
    opt("abcd", Seq("a", "ab", "##b", "##c", "##d", "##cd")) shouldBe "ab ##cd"
    // boundaries
    opt("", v1) shouldBe ""
    opt("zzz", v1) shouldBe "[UNK]"
  }

  test("byte mode: hex-pair pieces, whole-byte alignment, total fallback on any script") {
    def encB(word: String, vocab: Seq[String]): Seq[String] =
      Seq(word).toDF("word")
        .select(WordPieceFns.encodeNative(col("word"), vocab,
          byteLevel = true).as("t"))
        .collect().head.getSeq[String](0)
    // "é" = C3 A9; with the full byte alphabet any script tokenizes
    val full = (0 until 256).map(b => f"$b%02X".toUpperCase)
    val vocab = WordPiece.vocabFromMerges(full, Seq(("C3", "A9")))
    encB("é", vocab) shouldBe Seq("C3A9")
    encB("aé", vocab) shouldBe Seq("61", "##C3A9")
    // alignment: a piece may never split a byte — "3A" (the hex chars
    // straddling C3|A9) must not match even if present in the vocabulary
    val tricky = Seq("C3", "##3A", "##A9", "A9", "##C3")
    encB("é", tricky) shouldBe Seq("C3", "##A9")
    // no start piece for the first byte -> whole word [UNK]
    encB("é", Seq("##C3", "##A9")) shouldBe Seq("[UNK]")
    // unhex round-trip: pieces concatenate back to the exact byte stream
    val joined = encB("héllo", vocab).map(_.stripPrefix("##")).mkString
    new String(joined.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      "UTF-8") shouldBe "héllo"
  }

  test("tokenFreq weights distinct-word encodings by occurrence count") {
    val docs = Seq((1L, "aa aa b"), (2L, "aa")).toDF("doc_id", "text")
    val vocab = Seq("[UNK]", "a", "b", "aa", "##a", "##b", "##aa")
    val freq = WordPiece.tokenFreq(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    freq shouldBe Map("aa" -> 3L, "b" -> 1L)
  }
}
