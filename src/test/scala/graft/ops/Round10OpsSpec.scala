package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-10 operators: corpus-scale hard-negative mining,
  * shard materialization, and text–image pair construction.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

  // ------------------------------------------------- hard-negatives graph

  test("hardNegativesGraph probing ALL cells == exact corpus-as-queries hardNegatives") {
    val sub = embeddings.where(col("vec_id") < 120).cache()
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(sub, "embedding", nlist = 4))
    // nprobe = nlist: every query probes every cell, so the candidate set
    // is all different-label pairs — the graph path must equal the exact
    // broadcast baseline with corpus == queries
    val graph = Ann.hardNegativesGraph(sub, "vec_id", "embedding", "label",
        k = 5, cents, nprobe = 4, rankOnRoundedTo = Some(6))
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val exact = Ann.hardNegatives(sub, sub, "vec_id", "embedding", "label",
        k = 5, rankOnRoundedTo = Some(6))
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    graph shouldBe exact
  }

  test("hardNegativesGraph never returns a same-label neighbor and bounds rank") {
    val cents = Ann.ivfCentroidsFromDf(
      Ann.ivfTrain(embeddings, "embedding", nlist = 8))
    val labels = embeddings.select(col("vec_id").as("query_id"),
      col("label").as("__ql"))
    val out = Ann.hardNegativesGraph(embeddings, "vec_id", "embedding",
      "label", k = 3, cents, nprobe = 2, rankOnRoundedTo = Some(6)).cache()
    out.join(labels, Seq("query_id"))
      .where(col("neg_label") === col("__ql")).count() shouldBe 0L
    out.agg(max(col("rank"))).head().getInt(0) should be <= 3
    // per-query ranks are dense from 1
    out.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .where(col("n") =!= col("mx")).count() shouldBe 0L
  }
}
