package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first encoding (Wu et al. 2016; the
  * BERT tokenizer's inference rule, as implemented publicly in
  * huggingface/tokenizers WordPiece model): at each position take the
  * LONGEST vocabulary piece matching the remaining word — the start
  * position matches raw pieces, every later position matches `##`-prefixed
  * continuation pieces — and if any position has no match the ENTIRE word
  * encodes to the single `[UNK]` token.
  *
  * This is a different inference rule from BPE's merge-rank replay over
  * the same vocabulary (greedy-by-length vs greedy-by-learned-rank), which
  * is exactly why it gates separately: the two disagree on real words, and
  * a pipeline that budgets in one must not encode in the other.
  *
  * The walk is deterministic and needs only (vocabulary, word), so a SQL
  * oracle re-derives it from the persisted vocabulary with a precomputed
  * longest-match table and a recursive position walk.
  */
object WordPieceUtil {

  val Unk = "[UNK]"
  private val UnkU = UTF8String.fromString(Unk)
  private val ContU = UTF8String.fromString("##")

  /** Build the lookup state once per plan: a hash set of vocabulary pieces
    * plus the longest piece-core length (piece length net of the `##`
    * prefix) bounding the greedy scan.
    */
  def buildVocab(pieces: Array[UTF8String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { s.add(pieces(i)); i += 1 }
    s
  }

  /** Greedy longest-match encode of one word. `maxCore` bounds candidate
    * lengths (the longest piece core in the vocabulary). Matching runs on
    * java chars (UTF-16 code units) — identical to DuckDB's substr on this
    * engine's word alphabets, which are ASCII by construction in word mode
    * and arbitrary-but-consistent otherwise.
    */
  def encode(word: UTF8String, vocab: java.util.HashSet[UTF8String],
      maxCore: Int): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](4)
    var pos = 0
    while (pos < n) {
      var len = math.min(maxCore, n - pos)
      var hit: UTF8String = null
      while (hit == null && len >= 1) {
        val core = UTF8String.fromString(s.substring(pos, pos + len))
        val cand = if (pos == 0) core else UTF8String.concat(ContU, core)
        if (vocab.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UnkU))
      out.add(hit)
      pos += len
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** OPTIMAL segmentation (the SentencePiece/unigram-LM inference shape
    * with a deterministic cost): Viterbi DP minimizing the PIECE COUNT,
    * ties broken by the lexicographically smallest rendered sequence —
    * both total orders, so the segmentation is engine-reproducible
    * without float scores. Same vocabulary contract as [[encode]] (start
    * pieces raw, continuations `##`-prefixed); `[UNK]` only when NO
    * segmentation exists — strictly more robust than greedy, which can
    * dead-end on words the vocabulary does cover (the spec's fixture).
    * Returns the rendered space-joined sequence per word.
    */
  def encodeOptimal(word: UTF8String, vocab: java.util.HashSet[UTF8String],
      maxCore: Int): UTF8String = {
    val s = word.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    // best(p) = (pieces, rendered path) reaching char p, or null
    val bestK = new Array[Int](n + 1)
    val bestPath = new Array[String](n + 1)
    java.util.Arrays.fill(bestK, Int.MaxValue)
    bestK(0) = 0
    bestPath(0) = ""
    var p = 1
    while (p <= n) {
      var start = math.max(0, p - maxCore)
      while (start < p) {
        if (bestK(start) != Int.MaxValue) {
          val core = s.substring(start, p)
          val cand = if (start == 0) core else "##" + core
          if (vocab.contains(UTF8String.fromString(cand))) {
            val k = bestK(start) + 1
            val path =
              if (start == 0) core else bestPath(start) + " ##" + core
            if (k < bestK(p) ||
                (k == bestK(p) && path.compareTo(bestPath(p)) < 0)) {
              bestK(p) = k
              bestPath(p) = path
            }
          }
        }
        start += 1
      }
      p += 1
    }
    if (bestK(n) == Int.MaxValue) UnkU
    else UTF8String.fromString(bestPath(n))
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Byte-level greedy encode: the word's UTF-8 bytes render as the
    * uppercase hex-pair string (byte-BPE's symbol alphabet — DuckDB's
    * hex(encode(word))), and the walk advances in whole BYTES: candidate
    * cores are even-length hex substrings at even offsets, longest first,
    * continuation pieces `##`-prefixed, whole-word `[UNK]` on any miss.
    * `maxCoreBytes` bounds candidates in bytes (core chars / 2).
    */
  def encodeBytes(word: UTF8String, vocab: java.util.HashSet[UTF8String],
      maxCoreBytes: Int): ArrayData = {
    val bytes = word.getBytes
    val nb = bytes.length
    if (nb == 0) return new GenericArrayData(Array.empty[Any])
    val hex = new Array[Char](nb * 2)
    var i = 0
    while (i < nb) {
      val b = bytes(i) & 0xff
      hex(i * 2) = HexDigits(b >>> 4)
      hex(i * 2 + 1) = HexDigits(b & 0xf)
      i += 1
    }
    val s = new String(hex)
    val out = new java.util.ArrayList[UTF8String](4)
    var p = 0 // byte offset
    while (p < nb) {
      var len = math.min(maxCoreBytes, nb - p) // bytes
      var hit: UTF8String = null
      while (hit == null && len >= 1) {
        val core = UTF8String.fromString(s.substring(p * 2, (p + len) * 2))
        val cand = if (p == 0) core else UTF8String.concat(ContU, core)
        if (vocab.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UnkU))
      out.add(hit)
      p += len
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Codegen'd WordPiece encode of a single word (STRING → ARRAY<STRING>
  * pieces, continuation pieces carrying their `##` prefix) with the
  * vocabulary embedded. Vocab is a Seq for structural equality (the
  * [[BpeEncodeExpr]] canonicalization argument).
  */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String],
    byteLevel: Boolean = false)
    extends UnaryExpression {
  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] =
    WordPieceUtil.buildVocab(vocab.iterator.map(UTF8String.fromString).toArray)
  @transient private lazy val maxCore: Int = {
    // the [UNK] sentinel is emitted, never matched as a substring piece —
    // including its 5-char core in the bound would only widen the greedy
    // scan window past the longest REAL piece
    val cores = vocab.iterator.filter(_ != WordPieceUtil.Unk)
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length)
    val maxChars = if (cores.isEmpty) 2 else cores.max
    if (byteLevel) math.max(1, maxChars / 2) else maxChars
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  override def nullSafeEval(a: Any): Any =
    if (byteLevel)
      WordPieceUtil.encodeBytes(a.asInstanceOf[UTF8String], vocabSet, maxCore)
    else
      WordPieceUtil.encode(a.asInstanceOf[UTF8String], vocabSet, maxCore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("wpVocab", vocabSet, "java.util.HashSet")
    val fn = if (byteLevel) "encodeBytes" else "encode"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceUtil.$fn($c, $vRef, $maxCore)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}

/** Codegen'd optimal (Viterbi) segmentation of a single word against an
  * embedded vocabulary — STRING → STRING (the rendered sequence; `[UNK]`
  * when unreachable). Shares [[WordPieceEncodeExpr]]'s vocabulary shape.
  */
case class UnigramEncodeExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] =
    WordPieceUtil.buildVocab(vocab.iterator.map(UTF8String.fromString).toArray)
  @transient private lazy val maxCore: Int = {
    // [UNK] excluded from the bound: sentinel, not a matchable piece
    val cores = vocab.iterator.filter(_ != WordPieceUtil.Unk)
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length)
    if (cores.isEmpty) 1 else cores.max
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unigram_encode"

  override def nullSafeEval(a: Any): Any =
    WordPieceUtil.encodeOptimal(a.asInstanceOf[UTF8String], vocabSet, maxCore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("ugVocab", vocabSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceUtil.encodeOptimal($c, $vRef, $maxCore)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object WordPieceFns {
  /** WordPiece greedy encode of a word column against an embedded
    * vocabulary (start pieces raw, continuation pieces `##`-prefixed).
    * `byteLevel`: pieces are hex-pair byte strings (byte-BPE's alphabet)
    * and the walk advances in whole bytes.
    */
  def encodeNative(word: Column, vocab: Seq[String],
      byteLevel: Boolean = false): Column =
    ColumnShim.column(WordPieceEncodeExpr(ColumnShim.expression(word),
      vocab.toVector, byteLevel))

  /** Optimal (min-piece Viterbi, lexicographic tie-break) segmentation —
    * rendered space-joined sequence, `[UNK]` when unreachable.
    */
  def encodeOptimalNative(word: Column, vocab: Seq[String]): Column =
    ColumnShim.column(UnigramEncodeExpr(ColumnShim.expression(word),
      vocab.toVector))
}
