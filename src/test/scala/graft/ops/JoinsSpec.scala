package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: backward match, <= tie, null before first, dup-ts tiebreak") {
    val left = Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 20L, 102L),
      (2L, 3L, 200L), (3L, 7L, 300L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 4L, 10L, 1.0), (1L, 10L, 11L, 2.0), (1L, 15L, 12L, 3.0),
      (1L, 15L, 13L, 4.0), // duplicate ts: rid 13 must win (tieBreak desc)
      (2L, 9L, 20L, 9.0)) // after left's only row: no match
      .toDF("k", "t", "rid", "v")
    val out = Joins.asofJoin(left, right, on = "t", by = "k",
      valueCols = Seq("rid", "v"), tieBreak = "rid")
      .select("k", "lid", "asof_rid", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)))).toSet
    out shouldBe Set(
      (1L, 100L, Some(10L), Some(1.0)), // 5 -> right@4
      (1L, 101L, Some(11L), Some(2.0)), // 10 -> right@10 (tie included)
      (1L, 102L, Some(13L), Some(4.0)), // 20 -> right@15, rid 13 wins dup
      (2L, 200L, None, None), // right@9 is after left@3
      (3L, 300L, None, None)) // no right rows for k=3
  }

  test("rangeJoinBinned == naive theta join, any bin width") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("pid", "x")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 15)
    }.toDF("iid", "lo", "hi")
    val naive = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(0.5, 7.0, 1000.0)) {
      val binned = Joins.rangeJoinBinned(pts, ivs, "x", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"width $w: ") { binned shouldBe naive }
    }
    naive.size should be > 50
  }

  test("intervalOverlapBinned == naive overlap join, no duplicates") {
    val rnd = new scala.util.Random(13)
    def ivs(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextDouble() * 50
      (i.toLong, lo, lo + rnd.nextDouble() * 10)
    }.toDF(s"${tag}id", s"${tag}lo", s"${tag}hi")
    val a = ivs(60, "a")
    val b = ivs(60, "b")
    val naive = a.join(b, $"alo" <= $"bhi" && $"blo" <= $"ahi")
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binnedRows = Joins.intervalOverlapBinned(a, b, "alo", "ahi", "blo", "bhi", 4.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    binnedRows.length shouldBe binnedRows.toSet.size // dedup-free emit rule
    binnedRows.toSet shouldBe naive
    naive.size should be > 100
  }
}
