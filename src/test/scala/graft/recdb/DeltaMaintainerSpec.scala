package graft.recdb

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming delta maintenance: after every micro-batch the persisted model
  * equals the full rebuild over all events seen so far; replays are
  * idempotent; a crash between state write and commit is recovered by the
  * replay.
  */
class DeltaMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val c = EventCols()

  private def modelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("cosine delta stream == full rebuild after every batch") {
    val base = Files.createTempDirectory("graft-delta").toString
    val m = new DeltaSimilarityMaintainer(s"$base/events", s"$base/state",
      s"$base/model", c, RecMethod.ItemCosCF)
    val rnd = new scala.util.Random(5)
    val all = (1 to 300).map { i =>
      (rnd.nextInt(30).toLong, rnd.nextInt(15).toLong, rnd.nextInt(5) + 1.0, i)
    }
    val uniq = all.groupBy(t => (t._1, t._2)).values.map(_.head).toSeq.sortBy(_._4)
      .map(t => (t._1, t._2, t._3))
    val (b0, rest) = uniq.splitAt(uniq.size / 2)
    val (b1, b2) = rest.splitAt(rest.size / 2)
    m.init(b0.toDF("userid", "itemid", "rating"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val q = m.attach(mem.toDF().toDF("userid", "itemid", "rating"), s"$base/ckpt")
    mem.addData(b1: _*)
    q.processAllAvailable()
    m.latestVersion shouldBe 1L
    val inc1 = modelMap(spark.read.parquet(s"$base/model"))
    val full1 = modelMap(
      Similarity.itemCosine((b0 ++ b1).toDF("userid", "itemid", "rating"), c)
        .select(col("item1"), col("item2"), col("similarity")))
    inc1.keySet shouldBe full1.keySet
    inc1.foreach { case (k, v) => v shouldBe full1(k) +- 1e-9 }

    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    m.latestVersion shouldBe 2L
    val inc = modelMap(spark.read.parquet(s"$base/model"))
    val full = modelMap(Similarity.itemCosine(uniq.toDF("userid", "itemid", "rating"), c)
      .select(col("item1"), col("item2"), col("similarity")))
    inc.keySet shouldBe full.keySet
    inc.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 }
    graft.Exec.deletePath(base)
  }

  test("pearson delta: replay idempotent, out-of-order batch rejected") {
    val base = Files.createTempDirectory("graft-delta-p").toString
    val m = new DeltaSimilarityMaintainer(s"$base/events", s"$base/state",
      s"$base/model", c, RecMethod.ItemPearCF)
    val ev = Seq((1L, 10L, 4.0), (1L, 11L, 2.0), (2L, 10L, 5.0), (2L, 11L, 1.0),
      (3L, 10L, 3.0), (3L, 12L, 4.0), (4L, 11L, 2.0), (4L, 12L, 5.0))
    m.init(ev.take(5).toDF("userid", "itemid", "rating"))
    val d = ev.drop(5).toDF("userid", "itemid", "rating")
    m.processBatch(d, 0L) shouldBe true
    // replay of the same batch id is skipped, state unchanged
    m.processBatch(d, 0L) shouldBe false
    m.latestVersion shouldBe 1L
    val inc = modelMap(spark.read.parquet(s"$base/model"))
    val full = modelMap(Similarity.itemPearson(
      ev.toDF("userid", "itemid", "rating"), c)
      .select(col("item1"), col("item2"), col("similarity")))
    inc.keySet shouldBe full.keySet
    inc.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 }
    // a skipped-ahead batch id must fail loudly, not corrupt state
    an[IllegalArgumentException] should be thrownBy
      m.processBatch(d, 5L)
    graft.Exec.deletePath(base)
  }
}
