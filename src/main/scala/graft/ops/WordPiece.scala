package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{WordPieceFns, WordPieceUtil}

/** WordPiece tokenization (the BERT-family subword model) next to
  * [[Bpe]]: the vocabulary is DERIVED (alphabet + the symbols a BPE merge
  * run produces, each in start and `##`-continuation form — the public
  * huggingface/tokenizers BPE→WordPiece vocabulary construction), and
  * ENCODING is greedy longest-match-first per position with whole-word
  * `[UNK]` fallback ([[graft.functions.WordPieceUtil]]).
  *
  * Scale shape mirrors BPE's: the vocabulary is bounded (alphabet +
  * numMerges symbols, ×2 forms), embeds in one codegen'd expression, and
  * encoding runs once per DISTINCT word with occurrences joining back —
  * corpus text is never re-scanned per piece. The alphabet collect is
  * bounded by the corpus's distinct-character count (≤ 36 in word mode,
  * ≤ the script repertoire otherwise), never by corpus size.
  */
object WordPiece {

  /** Distinct single characters (or, byte mode, distinct hex-pair bytes)
    * across the corpus's words — the vocabulary floor that makes every
    * in-alphabet word encodable. Byte mode is bounded at 256 symbols by
    * construction.
    */
  def corpusAlphabet(docs: DataFrame, idCol: String, textCol: String,
      byteLevel: Boolean = false): Seq[String] = {
    val syms =
      if (byteLevel)
        Bpe.words(docs, idCol, textCol, byteLevel = true)
          .select(explode(expr(
            "regexp_extract_all(hex(encode(word, 'UTF-8')), '..', 0)")).as("c"))
      else
        Bpe.words(docs, idCol, textCol)
          .select(explode(filter(split(col("word"), ""), c => c =!= "")).as("c"))
    syms.distinct().collect().map(_.getString(0)).sorted.toSeq
  }

  /** The derived vocabulary: `[UNK]`, then every symbol (alphabet chars +
    * each merge's concatenation) in start form and `##` continuation form.
    */
  def vocabFromMerges(alphabet: Seq[String],
      merges: Seq[(String, String)]): Seq[String] = {
    val syms = (alphabet ++ merges.map { case (l, r) => l + r }).distinct
    (WordPieceUtil.Unk +: syms.flatMap(s => Seq(s, "##" + s))).distinct
  }

  /** Persistable one-column artifact (piece) — what the oracle (or another
    * engine) re-applies greedy matching against.
    */
  def vocabDf(spark: SparkSession, vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocab.toDF("piece")
  }

  def loadVocab(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path).select("piece")
      .collect().map(_.getString(0)).toSeq

  /** Encode the distinct-word frame: (word, wp_toks ARRAY<STRING>, n_wp).
    * Continuation pieces keep their `##` prefix, so `array_join(_, ' ')`
    * is the canonical rendering an oracle compares against.
    */
  def encodeVocab(vocab: DataFrame, pieces: Seq[String],
      byteLevel: Boolean = false): DataFrame =
    vocab.withColumn("wp_toks",
        WordPieceFns.encodeNative(col("word"), pieces, byteLevel))
      .withColumn("n_wp", size(col("wp_toks")))

  /** Corpus piece frequency under the vocabulary: encode each DISTINCT
    * word once, weight by word frequency. (tok, cnt).
    */
  def tokenFreq(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[String], byteLevel: Boolean = false): DataFrame =
    encodeVocab(Bpe.wordFreq(docs, idCol, textCol, byteLevel), pieces,
        byteLevel)
      .select(col("freq"), explode(col("wp_toks")).as("tok"))
      .groupBy("tok").agg(sum(col("freq")).as("cnt"))
}
