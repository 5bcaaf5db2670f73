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

  test("RecDBProperties: live update_threshold drives maintenance; vestigial knobs round-trip") {
    val base = Files.createTempDirectory("graft-props").toString
    val catalog = new RecCatalog(s"$base/catalog")
    // auto-created with the reference's defaults (utility.c:907)
    catalog.properties shouldBe RecDbProperties(0.5, 0, true)
    val eventsPath = s"$base/events.parquet"
    val initial = new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "rating")
    initial.write.parquet(eventsPath) // 10 events
    Recommender.create(spark, "p1", spark.read.parquet(eventsPath), "tbl",
      c, "itemcoscf", catalog, s"$base/models")
    val maint = new IncrementalMaintainer(catalog, eventsPath)
    // 2 events < 0.5×10: no rebuild under the default threshold
    val d2 = Seq((7L, 1L, 4.0), (7L, 2L, 2.0)).toDF("userid", "itemid", "rating")
    maint.processBatch("p1", d2, batchId = 0L) shouldBe false
    catalog.get("p1").get.updateCounter shouldBe 2
    // drop the threshold to 0.2 — the NEXT check reads it live
    // (getUpdateThreshold re-reads per check, recathon.c:908-948)
    catalog.setProperties(RecDbProperties(updateThreshold = 0.2,
      tailLength = 7, verboseQueries = false))
    val d1 = Seq((8L, 1L, 3.0)).toDF("userid", "itemid", "rating")
    // counter 3 >= 0.2×10 → rebuild now
    maint.processBatch("p1", d1, batchId = 1L) shouldBe true
    catalog.get("p1").get.updateCounter shouldBe 0
    // vestigial knobs persist verbatim (never consumed — same as reference)
    catalog.properties shouldBe RecDbProperties(0.2, 7, false)
    // explicit override ignores the store (embedding-deployment escape hatch)
    val fixed = new IncrementalMaintainer(catalog, eventsPath, Some(0.9))
    val d3 = Seq((9L, 1L, 1.0)).toDF("userid", "itemid", "rating")
    fixed.processBatch("p1", d3, batchId = 2L) shouldBe false
  }
}
