package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget bin assignment — the distributed skeleton of sequence
  * packing for LLM training: walk documents in a deterministic order,
  * accumulate token counts, and start a new bin whenever the running total
  * would cross `budget`.
  *
  * Scale design: packing is inherently sequential, so the sequence is scoped
  * to a SHARD (`shardCol`) and shards pack independently — exactly how
  * production packers parallelize (per input file / per bucket). The cumsum
  * is a windowed sum inside the shard partition: one shuffle on the shard
  * key, linear scan, no global window, no driver loop. A document longer
  * than `budget` occupies its own bin (standard overflow rule).
  *
  * The greedy "first fit in order" rule here is the deterministic,
  * oracle-checkable contract: bin boundaries depend only on (shard, order,
  * token counts), never on partitioning.
  */
object Packing {

  /** Adds `bin` (0-based within shard): the bin a document lands in when
    * documents are packed in `orderCol` order within each shard.
    *
    * A document starts a new bin when the exclusive running total of tokens
    * since the last bin break plus its own count exceeds `budget`. With the
    * simple floor(cumsum_exclusive / budget) formulation documents can
    * straddle a boundary; that is intentional — it models token-stream
    * packing (documents are concatenated and the stream is cut every
    * `budget` tokens), the common case for pretraining, and it keeps the
    * assignment a closed-form expression.
    */
  def tokenStreamBins(docs: DataFrame, shardCol: String, orderCol: String,
      tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("bin", floor(col("__cum") / budget).cast("long"))
      .drop("__cum")
  }
}
