package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Static entry points shared by the interpreted and codegen'd paths of the
  * sketch expressions (the [[VectorExprUtil]] pattern).
  */
object SketchExprUtil {
  /** CMS point estimate of a key, probed over the key's UTF-8 bytes.
    * [[CountMinSketch]]'s String path hashes exactly these bytes
    * (getHashBuckets(String) → getBytesFromUTF8String → the binary path),
    * so probing UTF8String.getBytes is bit-identical to the String probe
    * while skipping the UTF-16 round trip per row.
    */
  def cmsEstimate(cms: CountMinSketch, key: UTF8String): Long =
    cms.estimateCount(key.getBytes)
}

/** Codegen'd count-min-sketch point estimate of a STRING key — the map-side
  * screen of [[graft.ops.Sketch.heavyHitters]]. The sketch rides a torrent
  * broadcast (~1 MB at the default eps — too big to embed per-task as a
  * plan reference) and the probe runs inside whole-stage codegen: the one
  * stage that sees EVERY corpus row carries no per-row lambda.
  */
case class CmsEstimateExpr(child: Expression, bc: Broadcast[CountMinSketch])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(key: Any): Any =
    SketchExprUtil.cmsEstimate(bc.value, key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cmsBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      "graft.functions.SketchExprUtil.cmsEstimate(" +
        s"(org.apache.spark.util.sketch.CountMinSketch) $bcRef.value(), $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateExpr =
    copy(child = newChild)
}

object SketchFns {
  /** Codegen'd CMS estimate of a string column (null → null; compose the
    * null-pass decision at the Column level).
    */
  def cmsEstimateNative(key: Column, bc: Broadcast[CountMinSketch]): Column =
    ColumnShim.column(CmsEstimateExpr(
      ColumnShim.expression(key.cast("string")), bc))
}
