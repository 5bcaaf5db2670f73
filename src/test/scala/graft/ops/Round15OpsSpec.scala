package graft.ops

import graft.SparkSpec
import graft.streaming.{AnnIndexMaintainer, MaintenancePlanner,
  NearDupMaintainer, ShardMaintainer}
import graft.streaming.MaintenancePlanner.{AnnSpec, CurateSpec, DeltaSpec,
  ShardSpec}
import org.apache.spark.sql.functions._

/** Specs for the round-15 additions: the autonomous-maintenance planner
  * (one metadata-cost sweep across maintained states emitting the
  * (state, metric, value, threshold, decision) table).
  */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("deltaFraction: un-folded batch rows over total; batches at or " +
      "below the fold horizon are ignored; no-fold state is all delta") {
    val dir = tmp("delta")
    Seq(1, 2, 3).toDF("x").write.parquet(s"$dir/c1")
    Seq(4, 5, 6).toDF("x").write.parquet(s"$dir/b1") // covered by c1
    Seq(7, 8).toDF("x").write.parquet(s"$dir/b2")
    MaintenancePlanner.deltaFraction(spark, dir) shouldBe 0.4 +- 1e-12
    val dir2 = tmp("delta2")
    Seq(1).toDF("x").write.parquet(s"$dir2/b0")
    MaintenancePlanner.deltaFraction(spark, dir2) shouldBe 1.0
    MaintenancePlanner.deltaFraction(spark, tmp("delta3")) shouldBe 0.0
  }

  test("curateKlDrift: 0 without a baseline or without movement; " +
      "positive once post-baseline batches shift the distribution") {
    val dir = tmp("cur")
    def freq(batch: Long, words: Seq[String]): Unit =
      words.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
        .toSeq.toDF("word", "freq")
        .write.mode("overwrite").parquet(s"$dir/freq/b$batch")
    freq(0L, Seq("a", "a", "b"))
    // no selbase marker yet
    MaintenancePlanner.curateKlDrift(spark, dir) shouldBe 0.0
    new java.io.File(dir, "selbase0").mkdirs()
    // baseline == newest batch
    MaintenancePlanner.curateKlDrift(spark, dir) shouldBe 0.0
    freq(1L, Seq("zz", "zz", "zz", "zz"))
    val kl = MaintenancePlanner.curateKlDrift(spark, dir)
    kl should be > 0.1
  }

  test("plan: each state kind measured by its reader, decision flips with " +
      "the threshold, output bounded one row per spec") {
    // ANN arm: exact 2-cell quantizer, wave 1 same distribution (holds),
    // then a shifted wave pushes distortion past any sane ratio
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def vecs(ids: Seq[Long], shift: Double = 0.0) =
      ids.map(i => (i, Seq(
        (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * (i % 3) + shift,
        (if (i % 2 == 0) 0.0 else 1.0) + shift)))
        .toDF("vec_id", "embedding")
    val ann = tmp("planann")
    AnnIndexMaintainer.processBatchMonitored(vecs(0L to 9L), 0L, "vec_id",
      "embedding", cents, ann)
    AnnIndexMaintainer.markTrained(ann, 0L)
    AnnIndexMaintainer.processBatchMonitored(vecs(10L to 19L, shift = 5.0),
      1L, "vec_id", "embedding", cents, ann)
    // shard arm: two appends then a reconcile dropping one sequence
    val sh = tmp("plansh")
    val rows = Seq((0L, "1:2", 2L), (1L, "3:4", 2L), (2L, "5:6", 2L),
      (3L, "7:8", 2L)).toDF("seq_id", "ids_str", "n_tok")
    ShardMaintainer.reconcile(rows, 0L, epochs = 1, shardSize = 2, sh)
    ShardMaintainer.reconcile(rows.where(col("seq_id") =!= 0L), 1L,
      epochs = 1, shardSize = 2, sh)
    val plan = MaintenancePlanner.plan(spark, Seq(
      AnnSpec("idx", ann, 4.0),
      AnnSpec("idx_lenient", ann, 1e9),
      ShardSpec("sh", sh, 0.2),
      ShardSpec("sh_lenient", sh, 0.9)))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getDouble(2), r.getString(4)))).toMap
    plan should have size 4
    plan("idx")._1 shouldBe "drift_ratio"
    plan("idx")._3 shouldBe "retrain"
    plan("idx_lenient")._3 shouldBe "none"
    plan("sh")._1 shouldBe "dead_fraction"
    plan("sh")._2 shouldBe 0.25 +- 1e-12
    plan("sh")._3 shouldBe "compact"
    plan("sh_lenient")._3 shouldBe "none"
  }

  test("near-dup probeAsOf: reproduces a batch's recorded pair output " +
      "from current files after a full fold; horizon excludes later rows") {
    val base = tmp("ndasof")
    def waveBase(wave: Int): String =
      (0 until 8).map(j => s"w${wave}t$j").mkString(" ")
    val w = Seq.tabulate(9) { i =>
      // three waves of three docs; doc 3k+1 exactly duplicates the
      // PREVIOUS wave's base doc 3(k-1), everything else fully distinct
      val wave = i / 3
      val text = (i % 3) match {
        case 0 => waveBase(wave)
        case 1 if wave > 0 => waveBase(wave - 1)
        case _ => (0 until 8).map(j => s"u${i}x$j").mkString(" ")
      }
      (i.toLong, text)
    }.toDF("doc_id", "text")
    (0 until 3).foreach { g =>
      NearDupMaintainer.processBatch(w.where(col("doc_id") >= g * 3 &&
        col("doc_id") < (g + 1) * 3), g.toLong, "doc_id", "text",
        s"$base/index", s"$base/pairs")
    }
    val recorded = spark.read.parquet(s"$base/pairs/b2")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    recorded should not be empty
    // full fold: no batch dirs remain, the version axis lives on row stamps
    NearDupMaintainer.compact(spark, s"$base/index", upToOpt = Some(2L))
    NearDupMaintainer.indexAsOf(spark, s"$base/index", 1L)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe
      (0L to 5L).toSet
    val replayed = NearDupMaintainer.probeAsOf(spark, s"$base/index",
      w.where(col("doc_id") >= 6), "doc_id", "text", asOf = 1L)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    replayed should contain ((3L, 7L))
    replayed shouldBe recorded
    // at horizon 0 the wave-1 rows vanish: doc 7's exact twin (doc 3) is
    // not yet ingested, so the probe finds nothing
    NearDupMaintainer.probeAsOf(spark, s"$base/index",
      w.where(col("doc_id") >= 6), "doc_id", "text", asOf = 0L)
      .count() shouldBe 0L
  }

  test("plan: delta and curate specs route to their readers") {
    val dir = tmp("pland")
    Seq(1, 2).toDF("x").write.parquet(s"$dir/c0")
    Seq(3, 4).toDF("x").write.parquet(s"$dir/b1")
    val cur = tmp("planc")
    Seq(("a", 2L)).toDF("word", "freq")
      .write.parquet(s"$cur/freq/b0")
    Seq(("zz", 9L)).toDF("word", "freq")
      .write.parquet(s"$cur/freq/b1")
    new java.io.File(cur, "selbase0").mkdirs()
    val plan = MaintenancePlanner.plan(spark, Seq(
      DeltaSpec("d", dir, 0.4),
      CurateSpec("c", cur, 0.01)))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(4)))).toMap
    plan("d") shouldBe ("delta_fraction", "compact")
    plan("c") shouldBe ("kl_drift", "recurate")
  }
}
