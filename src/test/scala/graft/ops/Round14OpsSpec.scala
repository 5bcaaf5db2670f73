package graft.ops

import graft.SparkSpec
import graft.streaming.AnnIndexMaintainer
import org.apache.spark.sql.functions._

/** Specs for the round-14 additions: the drift-monitored ANN maintenance
  * loop (distortion metrics, the retrain trigger, offline retrain+rebuild
  * with batch_id provenance preserved).
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (1,0) and (0,1); the quantizer is exact
  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))

  private def vecs(ids: Seq[Long], shift: Double = 0.0) =
    ids.map(i => (i, Seq(
      (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * (i % 3) + shift,
      (if (i % 2 == 0) 0.0 else 1.0) + shift)))
      .toDF("vec_id", "embedding")

  test("driftRatio: None before baseline mark / with no post-baseline data; " +
      "near 1 on same-distribution waves; explodes on shifted waves") {
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, dir)
    // no trainbase marker yet → undefined
    AnnIndexMaintainer.driftRatio(spark, dir) shouldBe None
    AnnIndexMaintainer.markTrained(dir, 0L)
    // baseline alone (no post-baseline batches) → undefined
    AnnIndexMaintainer.driftRatio(spark, dir) shouldBe None
    AnnIndexMaintainer.processBatchMonitored(vecs(10L to 19L), 1L, "vec_id",
      "embedding", cents, dir)
    val same = AnnIndexMaintainer.driftRatio(spark, dir).get
    same should be > 0.1
    same should be < 3.0
    AnnIndexMaintainer.shouldRetrain(spark, dir, 4.0) shouldBe false
    AnnIndexMaintainer.processBatchMonitored(vecs(20L to 29L, shift = 5.0),
      2L, "vec_id", "embedding", cents, dir)
    AnnIndexMaintainer.shouldRetrain(spark, dir, 4.0) shouldBe true
  }

  test("metrics write is replay-idempotent: re-running a batch leaves one " +
      "identical sidecar row") {
    val dir = java.nio.file.Files.createTempDirectory("driftrp").toString
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, dir)
    val before = spark.read.parquet(s"$dir/m/b0").collect().toSeq
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, dir)
    val after = spark.read.parquet(s"$dir/m/b0").collect().toSeq
    after shouldBe before
    after should have size 1
  }

  test("retrain rebuilds into one consolidated generation, preserves " +
      "batch_id provenance, and resets the drift baseline") {
    val dir = java.nio.file.Files.createTempDirectory("driftrt").toString
    val dir2 = dir + "_g2"
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, dir)
    AnnIndexMaintainer.markTrained(dir, 0L)
    AnnIndexMaintainer.processBatchMonitored(vecs(10L to 19L, shift = 5.0),
      1L, "vec_id", "embedding", cents, dir)
    AnnIndexMaintainer.shouldRetrain(spark, dir, 4.0) shouldBe true
    val cdf = AnnIndexMaintainer.retrain(spark, dir, dir2)
    // rebuilt index holds every row, batch_id intact, in a single c-dir
    val idx = AnnIndexMaintainer.readIndex(spark, dir2)
    idx.count() shouldBe 20L
    idx.groupBy("batch_id").count().as[(Long, Long)].collect().toMap shouldBe
      Map(0L -> 10L, 1L -> 10L)
    new java.io.File(dir2, "c1").isDirectory shouldBe true
    // as-of through the rebuild: batch-0 slice only
    val newCents = Ann.ivfCentroidsFromDf(cdf)
    val asOf = AnnIndexMaintainer.searchAsOf(spark, dir2, newCents,
      Seq((100L, Array(1.0, 0.0))), k = 3, asOf = 0L,
      nprobe = newCents.length)
    asOf.select("neighbor_id").as[Long].collect()
      .foreach(_ should be < 10L)
    // fresh baseline: the rebuilt corpus under the fresh quantizer is the
    // new training era, so the drift signal resets to undefined
    AnnIndexMaintainer.trainedBatch(dir2) shouldBe 1L
    AnnIndexMaintainer.driftRatio(spark, dir2) shouldBe None
    AnnIndexMaintainer.shouldRetrain(spark, dir2, 4.0) shouldBe false
    // and the retrained quantizer actually models the shifted mass: mean
    // distortion under it is far below the stale-quantizer distortion
    val m = spark.read.parquet(s"$dir2/m/b1").select("sum_d2", "n")
      .as[(Double, Long)].head()
    (m._1 / m._2) should be < 1.0
  }

  // ------------------------------------------ learned tower (ridge head)

  test("ridgeHead recovers a planted linear map (small lambda, exact data)") {
    // y one-hot = argmax structure: plant x·W0 with W0 = [[1,0],[0,1]] by
    // labeling points by their dominant axis; ridge with tiny λ must
    // separate the classes in the projected space
    val pts = (0 until 40).map { i =>
      val cls = i % 2
      val v = if (cls == 0) Seq(1.0 + 0.01 * i, 0.1) else Seq(0.1, 1.0 + 0.01 * i)
      (i.toLong, v, cls)
    }.toDF("id", "v", "label")
    val wdf = Tower.ridgeHead(pts, "v", "label", lambda = 1e-6)
    wdf.count() shouldBe 4L // d=2 × L=2
    val w = Tower.weightsFromDf(wdf)
    w.length shouldBe 2
    val proj = pts.select(col("id"), col("label"),
      Tower.project(col("v"), w).as("p"))
      .as[(Long, Int, Seq[Double])].collect()
    // every point projects highest on its own class dim
    proj.foreach { case (_, cls, p) =>
      p.indexOf(p.max) shouldBe cls
    }
  }

  test("weightsFromDf roundtrips the persisted (j,k,w) frame exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tower").toString
    val pts = (0 until 20).map(i =>
      (i.toLong, Seq(i * 0.1, 1.0 - i * 0.05, 0.3), i % 3))
      .toDF("id", "v", "label")
    val wdf = Tower.ridgeHead(pts, "v", "label")
    wdf.write.mode("overwrite").parquet(dir)
    val direct = Tower.weightsFromDf(wdf)
    val rt = Tower.weightsFromDf(spark.read.parquet(dir))
    rt.map(_.toSeq).toSeq shouldBe direct.map(_.toSeq).toSeq
  }

  test("project = rounded sequential dot per output dim") {
    val w = Array(Array(1.0, 0.0, 2.0), Array(0.5, -1.0, 0.0))
    val p = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
      .select(Tower.project(col("v"), w).as("p"))
      .as[Seq[Double]].head()
    p shouldBe Seq(7.0, -1.5)
  }
}
