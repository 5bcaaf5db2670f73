package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers referenced from generated code (the
  * [[VectorExprUtil]] pattern). BPE semantics are the canonical
  * byte-pair-encoding ones (Sennrich et al. 2016, public algorithm):
  *
  *   - a MERGE PASS applies one rule (l, r)→l+r to a symbol sequence in a
  *     single leftmost, non-overlapping, continue-after-match scan —
  *     [a,a,a,a] under (a,a) becomes [aa,aa], [a,a,a] becomes [aa,a];
  *   - ENCODING applies the learned rules once each, in rank order. This is
  *     equivalent to the lowest-rank-first priority loop because a rule's
  *     operands always exist before it (any rule consuming a merged symbol
  *     was necessarily learned later), so no earlier rule can become newly
  *     applicable after a later one runs.
  *
  * The rank-order form is what makes encoding SQL-expressible: each rule is
  * one sequential string replace over a marker-delimited rendering, so a
  * DuckDB oracle can re-apply a persisted merges table verbatim.
  */
object BpeUtil {

  /** One merge pass over a symbol array: leftmost, non-overlapping,
    * continue after the merged symbol.
    */
  def mergePass(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return syms
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms.getUTF8String(i).equals(l) &&
          syms.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Encode one word: split to single-character symbols, then apply every
    * merge rule once, in rank order (`merges` is the flat
    * [l0, r0, l1, r1, ...] rendering — rank i at offsets 2i, 2i+1).
    */
  def encode(word: UTF8String, merges: Array[UTF8String]): ArrayData = {
    val s = word.toString
    val syms: Array[UTF8String] = new Array[UTF8String](s.length)
    var i = 0
    while (i < s.length) {
      syms(i) = UTF8String.fromString(String.valueOf(s.charAt(i)))
      i += 1
    }
    new GenericArrayData(applyMerges(syms, merges).asInstanceOf[Array[Any]])
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Byte-level encode: symbols are the word's UTF-8 bytes rendered as
    * uppercase hex pairs ("C3", "A9", …) — a bounded 256-symbol alphabet
    * with total byte fallback (ANY script tokenizes), and a rendering DuckDB
    * reproduces exactly via hex(encode(word)). Merged symbols concatenate to
    * longer even-length hex strings; the original word is recoverable by
    * unhexing the concatenation, so encoding stays lossless.
    */
  def encodeBytes(word: UTF8String, merges: Array[UTF8String]): ArrayData = {
    val bytes = word.getBytes
    val syms: Array[UTF8String] = new Array[UTF8String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      syms(i) = UTF8String.fromString(
        new String(Array(HexDigits(b >>> 4), HexDigits(b & 0xf))))
      i += 1
    }
    new GenericArrayData(applyMerges(syms, merges).asInstanceOf[Array[Any]])
  }

  private def applyMerges(syms0: Array[UTF8String],
      merges: Array[UTF8String]): Array[UTF8String] = {
    var syms = syms0
    var m = 0
    while (m < merges.length && syms.length >= 2) {
      val l = merges(m); val r = merges(m + 1)
      // in-place-ish pass; only allocate when the rule fires
      var j = 0
      var w = 0
      var fired = false
      val out = new Array[UTF8String](syms.length)
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j).equals(l) && syms(j + 1).equals(r)) {
          out(w) = UTF8String.concat(l, r); w += 1; j += 2; fired = true
        } else {
          out(w) = syms(j); w += 1; j += 1
        }
      }
      if (fired) syms = java.util.Arrays.copyOf(out, w)
      m += 2
    }
    syms
  }
}

/** Codegen'd single BPE merge pass over an ARRAY<STRING> symbol column —
  * the per-round transform of distributed merge learning.
  */
case class BpeMergePassExpr(child: Expression, l: String, r: String)
    extends UnaryExpression {
  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_pass"

  override def nullSafeEval(a: Any): Any =
    BpeUtil.mergePass(a.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU,
      "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", rU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeUtil.mergePass($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePassExpr =
    copy(child = newChild)
}

/** Codegen'd BPE encode of a single word (STRING → ARRAY<STRING> tokens)
  * with the learned merge table embedded — rules apply once each in rank
  * order (see [[BpeUtil]] for the equivalence argument).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[String],
    byteLevel: Boolean = false)
    extends UnaryExpression {
  // Seq, not Array: case-class equality on an Array field is by reference,
  // which would make structurally identical encode expressions compare
  // unequal — breaking canonicalization, subexpression elimination, and
  // plan-level cache dedup for every BPE query.
  require(merges.length % 2 == 0, "merges must be flat (l, r) pairs")
  @transient private lazy val mergesU: Array[UTF8String] =
    merges.iterator.map(UTF8String.fromString).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(a: Any): Any =
    if (byteLevel) BpeUtil.encodeBytes(a.asInstanceOf[UTF8String], mergesU)
    else BpeUtil.encode(a.asInstanceOf[UTF8String], mergesU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergesU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val fn = if (byteLevel) "encodeBytes" else "encode"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeUtil.$fn($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeFns {
  /** One merge-rule pass over an ARRAY<STRING> symbol column. */
  def mergePassNative(syms: Column, l: String, r: String): Column =
    ColumnShim.column(BpeMergePassExpr(ColumnShim.expression(syms), l, r))

  /** Full BPE encode of a word column with an embedded rank-ordered merge
    * table (flattened (l, r) pairs). `byteLevel` switches symbols from
    * single characters to UTF-8 hex-pair bytes.
    */
  def encodeNative(word: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    ColumnShim.column(BpeEncodeExpr(ColumnShim.expression(word),
      merges.iterator.flatMap(p => Iterator(p._1, p._2)).toVector, byteLevel))
}
