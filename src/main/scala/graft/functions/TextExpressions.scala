package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight eval loops for the text hot path, shared by interpreted eval and
  * generated code (objects get Java static forwarders, so Janino can call
  * them directly).
  *
  * Why these exist: the higher-order-function forms in [[graft.ops.TextOps]] /
  * [[graft.ops.Dedup]] (`transform`/`aggregate`/`zip_with`) are semantically
  * right and SQL-portable, but HOFs evaluate through per-element lambda
  * closures with no codegen — profiled at ~0.3 ms/doc for 3-gram shingling,
  * which made expression evaluation (not the join!) the dominant cost of the
  * dedup family. The semantics here are bit-identical to the HOF forms
  * (OpsSpec asserts equality), just evaluated in one JVM loop per document.
  */
object TextExprUtil {

  /** split(text, " ") with Java `split(re, -1)` semantics (trailing empties
    * kept, "" → [""]) — byte-level scan; a 0x20 byte never occurs inside a
    * multi-byte UTF-8 sequence, so this equals the regex split on " ".
    */
  def splitSpace(s: UTF8String): Array[UTF8String] = {
    val bytes = s.getBytes
    var cnt = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) cnt += 1
      i += 1
    }
    val out = new Array[UTF8String](cnt)
    var start = 0
    var k = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
        start = i + 1
      }
      i += 1
    }
    out
  }

  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-grams of split-on-space tokens, first-occurrence order —
    * same contract as [[graft.ops.Dedup.wordNgrams]] (docs with fewer than n
    * tokens yield an empty array).
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = splitSpace(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    val win = new Array[UTF8String](n)
    while (i + n <= toks.length) {
      var j = 0
      while (j < n) { win(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, win: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Distinct character n-grams (codepoint-aware windows), first-occurrence
    * order — same contract as [[graft.ops.TextOps.charNgrams]] (texts shorter
    * than n characters yield an empty array).
    */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + n <= len) {
      seen.add(text.substringSQL(i + 1, n))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Unicode NFC normalization — canonical composition, the pre-dedup
    * normalization every multi-source corpus needs (visually identical
    * strings with different codepoint sequences must hash identically).
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Accent folding: NFD decomposition with combining marks stripped
    * ("café" → "cafe") — the aggressive fold for match keys, not for
    * display text.
    */
  def foldAccents(text: UTF8String): UTF8String = {
    val s = java.text.Normalizer.normalize(text.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** MinHash signature in one pass: for each gram, h = pmod(murmur3(g), P)
    * (Spark's `hash()` semantics: 32-bit murmur3, seed 42, sign-extended),
    * then sig_i = min over grams of (a_i·h + b_i) mod P — identical values
    * to the explode + numPerm-way min-aggregate form in
    * [[graft.ops.Dedup.minhashSignatures]], without materializing
    * |grams| × numPerm rows through an exchange. Empty gram arrays yield an
    * empty signature (callers filter those docs, matching the aggregation
    * form where they simply have no rows).
    */
  def minhashSig(grams: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val p = 2147483647L // Mersenne prime 2^31−1, matches Dedup.MinhashP
    val nGrams = grams.numElements()
    val nPerm = as.length
    if (nGrams == 0) return new GenericArrayData(Array.empty[Any])
    val sig = new Array[Long](nPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var g = 0
    while (g < nGrams) {
      val h0 = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(grams.getUTF8String(g), StringType, 42L).toInt.toLong
      val h = ((h0 % p) + p) % p
      var i = 0
      while (i < nPerm) {
        val v = (as(i) * h + bs(i)) % p // a,b < P and h < P: no overflow at 2^62
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  /** Base-2 Shannon entropy over the text's codepoints — the "does this look
    * like natural text or noise/binary junk" quality signal (low entropy =
    * repeated filler, high = random bytes). Matches DuckDB's
    * `entropy(unnest(string_split(text, '')))` aggregate: probabilities over
    * codepoint frequencies, log base 2; empty text → 0.
    */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** High 60 bits of md5(token) — the value of the first 15 hex nibbles.
    * Chosen over xxhash64 because every SQL engine exposes md5(), so the
    * signature (and hence the whole SimHash operator) is reproducible
    * outside the JVM: `('0x' || substr(md5(t), 1, 15))::BIGINT` in DuckDB,
    * `conv(substr(md5(t), 1, 15), 16, 10)` in Spark SQL. 15 nibbles keep
    * the value positive in a signed 64-bit integer on engines without
    * unsigned types.
    */
  def md5Prefix60(t: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(t.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** 60-bit SimHash over split-on-space tokens (md5-prefix hash per token,
    * per-bit ±1 votes, sign → bit) — same contract as
    * [[graft.ops.Dedup.simhash60]].
    */
  def simhash60(text: UTF8String): Long = {
    val toks = splitSpace(text)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = md5Prefix60(toks(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Codegen'd distinct word n-gram shingles: ARRAY<STRING> from a text column,
  * one tight loop per row (vs the interpreted HOF chain — see TextExprUtil).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(s: Any): Any =
    TextExprUtil.wordShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprUtil.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Codegen'd distinct character n-grams of a text column. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(s: Any): Any =
    TextExprUtil.charShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprUtil.charShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Codegen'd Unicode NFC normalization of a text column. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def nullSafeEval(s: Any): Any =
    TextExprUtil.nfcNormalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprUtil.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Codegen'd accent folding (NFD minus combining marks) of a text column. */
case class FoldAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_accents"
  override def nullSafeEval(s: Any): Any =
    TextExprUtil.foldAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprUtil.foldAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
}

/** Codegen'd one-pass MinHash signature of a gram-array column: ARRAY<LONG>
  * of `numPerm` mins. The permutation tables ride along as reference
  * objects, so generated code calls straight into the same static loop the
  * interpreted path uses.
  */
case class MinhashSig(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression {
  require(numPerm >= 1, "numPerm must be >= 1")

  private lazy val (asArr, bsArr) = {
    val (a, b) = graft.ops.Dedup.permutations(numPerm, seed)
    (a.toArray, b.toArray)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(g: Any): Any =
    TextExprUtil.minhashSig(g.asInstanceOf[ArrayData], asArr, bsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprUtil.minhashSig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Codegen'd base-2 character-entropy of a text column (one counting pass
  * per row; the HOF equivalent would explode every codepoint through a
  * shuffle-side aggregate).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(s: Any): Any =
    TextExprUtil.charEntropy(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprUtil.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Codegen'd 60-bit SimHash signature of a text column (md5-prefix token
  * hash — engine-portable, see [[TextExprUtil.md5Prefix60]]).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(s: Any): Any =
    TextExprUtil.simhash60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object TextFns {
  /** Distinct word n-grams (split on single space), native fast path. */
  def wordShinglesNative(text: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(text), n))

  /** Distinct character n-grams, native fast path. */
  def charShinglesNative(text: Column, n: Int): Column =
    ColumnShim.column(CharShingles(ColumnShim.expression(text), n))

  /** 60-bit SimHash (split on single space), native fast path. */
  def simhashNative(text: Column): Column =
    ColumnShim.column(SimHash60(ColumnShim.expression(text)))

  /** Unicode NFC canonical composition. */
  def nfc(text: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(text)))

  /** Accent folding (NFD, combining marks stripped). */
  def foldAccents(text: Column): Column =
    ColumnShim.column(FoldAccents(ColumnShim.expression(text)))

  /** Base-2 Shannon entropy of the text's codepoint distribution. */
  def charEntropy(text: Column): Column =
    ColumnShim.column(CharEntropy(ColumnShim.expression(text)))

  /** One-pass MinHash signature (numPerm longs) of a gram array. */
  def minhashSigNative(grams: Column, numPerm: Int, seed: Long = 42L): Column =
    ColumnShim.column(MinhashSig(ColumnShim.expression(grams), numPerm, seed))
}
