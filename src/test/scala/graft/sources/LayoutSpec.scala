package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order layout: correctness is layout-invariant; the POINT is measured
  * scan pruning — a 2-D box predicate over a z-clustered table must read a
  * small fraction of the records a randomly-laid-out copy reads.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Execute the frame's physical plan and return the parquet scan's
    * numOutputRows — rows surviving row-group/page pruning by the pushed
    * filters (Spark re-applies the filter above, so this measures I/O, not
    * the result).
    */
  private def scanRows(df: DataFrame): Long = {
    df.queryExecution.executedPlan.execute().count()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("interleaveBits: known Morton codes") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (7L, 5L))
      .toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), bits = 4).as("z"))
      .as[Long].collect()
    // z = interleave(x lsb at bit0, y lsb at bit1): (2,3)->0b1110=14,
    // (7,5)->0b110111=55
    got shouldBe Array(0L, 1L, 2L, 3L, 14L, 55L)
  }

  test("compact: many small files -> few, data identical, atomic swap") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$base/t"
    val data = (1L to 50000L).map(i => (i, i % 997)).toDF("id", "v")
    data.repartition(64).write.parquet(path)
    val (nb, na) = Layout.compact(spark, path, targetFileBytes = 1L << 20)
    nb shouldBe 64
    na should be < 8
    val back = spark.read.parquet(path)
    back.count() shouldBe 50000L
    back.agg(sum("id"), sum("v")).head() shouldBe
      data.agg(sum("id"), sum("v")).head()
    graft.Exec.deletePath(base)
  }

  test("z-ordered layout prunes a box query; results equal the random layout") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 200000).map { i =>
      (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }.toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // random layout: every file spans the full (x, y) range
    data.orderBy(rand(11)).repartition(32)
      .write.mode("overwrite").parquet(s"$base/random")
    Layout.zorderWrite(data, Seq("x", "y"), s"$base/zorder", files = 32)

    def box(path: String): DataFrame =
      spark.read.parquet(path)
        .where(col("x") <= 63L && col("y") <= 63L)
        .select("id", "x", "y")

    val wantRows = box(s"$base/random").collect().map(_.toString).sorted
    val gotRows = box(s"$base/zorder").collect().map(_.toString).sorted
    gotRows shouldBe wantRows

    val readRandom = scanRows(box(s"$base/random"))
    val readZ = scanRows(box(s"$base/zorder"))
    // the box covers (64/1024)^2 ≈ 0.4% of the key space; z-clustered row
    // groups outside it are skipped by parquet min/max stats, the random
    // layout reads everything
    assert(readRandom >= 190000L,
      s"random layout should read ~all records, read $readRandom")
    assert(readZ <= readRandom / 4,
      s"z-order should prune most row groups: read $readZ vs $readRandom")
    graft.Exec.deletePath(base)
  }
}
