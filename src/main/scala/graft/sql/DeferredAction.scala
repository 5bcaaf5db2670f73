package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Attribute
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
  override def computeStats(): Statistics = Statistics(sizeInBytes = 1L)
}

final case class DeferredActionExec(output: Seq[Attribute], label: String,
    thunk: () => Seq[Row]) extends LeafExecNode {
  // once per executed plan: collect() after execute() (or the gate
  // harness's count-then-write) must observe the SAME action run, not
  // re-fire a second (empty-by-idempotence) one mid-statement
  private lazy val result: Array[InternalRow] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    thunk().map(r => conv(r).asInstanceOf[InternalRow]).toArray
  }
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(result.toIndexedSeq, 1)
  override def executeCollect(): Array[InternalRow] = result
  override def nodeName: String = s"GraftAction($label)"
}

class GraftActionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredActionRelation(out, label, thunk) =>
      DeferredActionExec(out, label, thunk) :: Nil
    case _ => Nil
  }
}
