package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path: a codegen'd dense
  * dot product over ARRAY<DOUBLE>.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions evaluate through per-element lambda closures and fall out of
  * whole-stage codegen, which made pairwise-cosine the dominant cost of ANN
  * ops. This expression generates a tight primitive loop inside the stage
  * (the preference order of the builder prompt: compose built-ins → custom
  * Expression → custom plan → mapPartitions).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> inputs, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** Shared eval helpers callable from generated code (static forwarders). */
object VectorExprUtil {
  /** Zero-filled double[dims] scattered from (index, value) entries — the
    * sparse→dense bridge for the bounded-dimension strategy. Entries with
    * out-of-range indices are ignored (cannot occur for indices built by
    * dense_rank over the same data).
    */
  def denseFromEntries(entries: ArrayData, dims: Int): ArrayData = {
    val out = new Array[Double](dims)
    val n = entries.numElements()
    var k = 0
    while (k < n) {
      val row = entries.getStruct(k, 2)
      val i = row.getInt(0)
      if (i >= 0 && i < dims) out(i) = row.getDouble(1)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd scatter of ARRAY<STRUCT<i:INT, v:DOUBLE>> into a zero-filled
  * dense ARRAY<DOUBLE> of fixed width.
  */
case class DenseFromEntries(child: Expression, dims: Int)
    extends UnaryExpression {
  require(dims >= 1, "dims must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_dense_from_entries"

  override def nullSafeEval(a: Any): Any =
    VectorExprUtil.denseFromEntries(a.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.denseFromEntries($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): DenseFromEntries =
    copy(child = newChild)
}

/** Codegen'd count of positions where two ARRAY<LONG> agree — the MinHash
  * signature-similarity estimator (matches/numPerm ≈ jaccard).
  */
case class LongMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_match_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongMatchCount = copy(left = newLeft, right = newRight)
}

object VectorFns {
  /** Codegen'd dot(a, b) over two ARRAY<DOUBLE> columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(
      ColumnShim.expression(a.cast("array<double>")),
      ColumnShim.expression(b.cast("array<double>"))))

  /** Dense ARRAY<DOUBLE>(dims) from ARRAY<STRUCT<i INT, v DOUBLE>> entries. */
  def denseFromEntries(entries: Column, dims: Int): Column =
    ColumnShim.column(DenseFromEntries(ColumnShim.expression(entries), dims))

  /** Positions where two ARRAY<LONG> agree (MinHash similarity estimate). */
  def matchCount(a: Column, b: Column): Column =
    ColumnShim.column(LongMatchCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
