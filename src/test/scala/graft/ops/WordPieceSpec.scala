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

  test("tokenFreq weights distinct-word encodings by occurrence count") {
    val docs = Seq((1L, "aa aa b"), (2L, "aa")).toDF("doc_id", "text")
    val vocab = Seq("[UNK]", "a", "b", "aa", "##a", "##b", "##aa")
    val freq = WordPiece.tokenFreq(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    freq shouldBe Map("aa" -> 3L, "b" -> 1L)
  }
}
