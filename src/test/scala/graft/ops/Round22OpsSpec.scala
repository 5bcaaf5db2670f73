package graft.ops

import graft.SparkSpec
import graft.streaming.{AnnIndexMaintainer, CurateMaintainer, Retention}

/** Specs for the round-15 retention-contract closure: nested state
  * layouts under a superseded dir are rejected AT STAMP TIME
  * ([[Retention.markSuperseded]]). The sweep's held-pin path vacuums a
  * held dir's OWN generation families at the pin floor, but a pin
  * matches by canonical dir — it could not floor a NESTED state's
  * vacuum, and a family-less superseded dir wrapping a nested state
  * would be held forever and swept never. Stamping is the choke point,
  * so the shape is made unconstructible instead of latently leaky.
  */
class Round22OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val blobCents = Array(Array(1.0, 0.0, 3.0, 0.0),
    Array(0.0, 1.0, 0.0, 3.0))

  private def blobVecs(ids: Range) =
    ids.map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0.0, 3.0, 0.0)
        else Seq(0.0, 1.0, 0.0, 3.0)
      (i.toLong, base.map(_ + 0.01 * (i % 3)))
    }.toDF("vec_id", "embedding")

  private def centsDf(cents: Array[Array[Double]]) =
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "c")

  test("markSuperseded REJECTS a dir with a whole nested state beneath " +
      "it — the pin-floor contract cannot govern a nested layout, so " +
      "the shape must not be constructible") {
    val root = tmp("nestsup")
    val outer = s"$root/wrapper"
    new java.io.File(outer).mkdirs()
    // a real nested state: a curation selection generation two levels in
    val inner = s"$outer/pipeline/cur"
    val docs = Seq((1L, "alpha beta gamma the and"),
      (2L, "delta epsilon zeta the and")).toDF("doc_id", "text")
    CurateMaintainer.processBatch(docs, 0L, "doc_id", "text", 5, inner)
    CurateMaintainer.deriveSelection(docs, 0L, "doc_id", "text", 5,
      s"$outer/pipeline", tokenBudget = 100L)
    val e = intercept[IllegalArgumentException](
      Retention.markSuperseded(outer, s"$root/new"))
    e.getMessage should include("nested state layout")
    e.getMessage should include("pipeline")
    // nothing was stamped — the dir stays discoverable as its contents
    new java.io.File(outer, "_superseded").exists() shouldBe false
  }

  test("markSuperseded REJECTS a dir wrapping an already-superseded " +
      "nested dir (a held wrapper would orphan the inner retirement)") {
    val root = tmp("nestsup2")
    val outer = s"$root/wrapper"
    val inner = s"$outer/old_gen"
    new java.io.File(inner).mkdirs()
    Retention.markSuperseded(inner, s"$root/new_gen") // legal on its own
    val e = intercept[IllegalArgumentException](
      Retention.markSuperseded(outer, s"$root/new"))
    e.getMessage should include("nested state layout")
  }

  test("markSuperseded still ACCEPTS a normal pre-rebuild generation " +
      "dir — its own families (quantizer generations, LSM batch dirs) " +
      "are not nested states") {
    val root = tmp("nestsupok")
    val dir = s"$root/gen_old"
    AnnIndexMaintainer.processBatchMonitored(blobVecs(0 to 5), 0L,
      "vec_id", "embedding", blobCents, dir, roundScale = 6)
    Seq(0L, 2L).foreach(b =>
      AnnIndexMaintainer.persistCentroids(spark, dir, b, centsDf(blobCents)))
    Retention.markSuperseded(dir, s"$root/gen_new")
    new java.io.File(dir, "_superseded").exists() shouldBe true
    // and discovery still classifies it as superseded alone
    Retention.discoverStates(root).toSet shouldBe Set(("superseded", dir))
  }
}
