package graft.recdb

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** R17 end-to-end: stream inserts through foreachBatch, counter semantics,
  * threshold-triggered full rebuild with counter reset (recathon.c:951-1203).
  */
class MaintainerSpec extends SparkSpec {
  import spark.implicits._

  val c: EventCols = EventCols("userid", "itemid", "rating")

  test("threshold retrain: counter accumulates, rebuild at 0.5×eventTotal, reset") {
    val base = Files.createTempDirectory("graft-maint").toString
    val catalog = new RecCatalog(s"$base/catalog")
    val eventsPath = s"$base/events.parquet"
    val initial = new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "rating")
    initial.write.parquet(eventsPath) // 10 events
    val entry = Recommender.create(spark, "m1",
      spark.read.parquet(eventsPath), "tbl", c, "itemcoscf", catalog, s"$base/models")
    entry.eventTotal shouldBe 10
    val modelBefore = spark.read.parquet(entry.modelPaths.head).count()

    val maint = new IncrementalMaintainer(catalog, eventsPath)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("userid", "itemid", "rating")
    val q = maint.attach(stream, "m1", s"$base/ckpt")

    // 3 new events: 3 < 0.5×10 → counter only
    mem.addData((5L, 1L, 4.0), (5L, 2L, 2.0), (5L, 3L, 5.0))
    q.processAllAvailable()
    catalog.get("m1").get.updateCounter shouldBe 3
    catalog.get("m1").get.eventTotal shouldBe 10

    // 2 more: 5 >= 0.5×10 → full rebuild, counters reset, eventTotal = 15
    mem.addData((5L, 4L, 1.0), (6L, 1L, 3.0))
    q.processAllAvailable()
    q.stop()
    val after = catalog.get("m1").get
    after.updateCounter shouldBe 0
    after.eventTotal shouldBe 15
    // rebuilt model reflects the enlarged events table (u5 co-rates widely)
    val modelAfter = spark.read.parquet(entry.modelPaths.head).count()
    modelAfter should be >= modelBefore
    val full = spark.read.parquet(eventsPath)
    full.count() shouldBe 15
    val expected = Similarity.itemCosine(full, c).count()
    modelAfter shouldBe expected
  }
}
