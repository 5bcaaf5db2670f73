package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** EXPLAIN-SAFE action relations — the execution-time home for the
  * GRAFT_VACUUM / GRAFT_SWEEP "DELETE … RETURNING" semantics.
  *
  * The GRAFT_* placeholders are substituted at ANALYSIS time
  * ([[ResolveRecommend]]); running the GC inside that substitution meant
  * `EXPLAIN SELECT * FROM GRAFT_VACUUM(...)` performed the vacuum — an
  * EXPLAIN-that-deletes, a least-surprise violation even though pins and
  * idempotence made it safe. This leaf plan defers the effect to
  * EXECUTION: analysis only records the action's schema and a thunk;
  * planning (including EXPLAIN, with this node visible in the plan tree)
  * runs nothing; the first execute/collect of the statement runs the
  * action exactly once per executed plan (the memoized `result`) and
  * serves its returned rows. Re-executing the same statement re-runs the
  * action — idempotent by the GC operations' own contract (a re-run
  * drops nothing new and reports the empty set).
  */
final case class DeferredActionRelation(output: Seq[Attribute],
    label: String, thunk: () => Seq[Row]) extends LeafNode {
  // the once-per-statement memo lives on the LOGICAL node: AQE (or any
  // physical re-planning) builds a fresh exec node from this relation,
  // and a memo on the exec would re-fire the thunk there — the second,
  // idempotent run returns the empty set, silently blanking the
  // statement's RETURNING rows. Every physical instantiation of one
  // analyzed statement must observe the same action run.
  lazy val actionRows: Seq[Row] = thunk()
  override def computeStats(): Statistics = Statistics(sizeInBytes = 1L)
}

final case class DeferredActionExec(output: Seq[Attribute], label: String,
    thunk: () => Seq[Row]) extends LeafExecNode {
  // once per executed plan: collect() after execute() (or the gate
  // harness's count-then-write) must observe the SAME action run, not
  // re-fire a second (empty-by-idempotence) one mid-statement.
  // Rows are emitted as UnsafeRow (the LocalTableScanExec discipline):
  // an exchange fed by this leaf (ORDER BY / GROUP BY / JOIN over the
  // RETURNING set) serializes with UnsafeRowSerializer, which
  // ClassCastExceptions on the converter's GenericInternalRow output.
  private lazy val result: Array[InternalRow] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val proj = UnsafeProjection.create(output, output)
    thunk().map(r =>
      proj(conv(r).asInstanceOf[InternalRow]).copy(): InternalRow).toArray
  }
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(result.toIndexedSeq, 1)
  override def executeCollect(): Array[InternalRow] = result
  override def nodeName: String = s"GraftAction($label)"
}

class GraftActionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case r @ DeferredActionRelation(out, label, _) =>
      // hand the exec the RELATION's memo, not the raw thunk — see
      // DeferredActionRelation.actionRows
      DeferredActionExec(out, label, () => r.actionRows) :: Nil
    case _ => Nil
  }
}
