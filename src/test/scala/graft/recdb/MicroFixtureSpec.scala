package graft.recdb

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** FIXTURES.md §5 — hand-checkable 4-user × 4-item events set exercising the
  * correctness-bearing quirks of SURVEY.md §2.3. Expected values are computed
  * from first principles in plain Scala below, not hard-coded magic numbers.
  */
class MicroFixtureSpec extends SparkSpec {
  import spark.implicits._

  val c: EventCols = EventCols("userid", "itemid", "rating")

  // (u1..u4 = 1..4, i1..i4 = 1..4); u5 has no events and must be absent
  val fixture: Seq[(Long, Long, Double)] = Seq(
    (1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 4.0),
    (2L, 1L, 3.0), (2L, 2L, 1.0), (2L, 4L, 2.0),
    (3L, 2L, 4.0), (3L, 3L, 4.0), (3L, 4L, 5.0),
    (4L, 4L, 1.0))

  def ratings: DataFrame = fixture.toDF("userid", "itemid", "rating")

  // dense reconstruction for expectations
  val byUser: Map[Long, Map[Long, Double]] =
    fixture.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
  val byItem: Map[Long, Map[Long, Double]] =
    fixture.groupBy(_._2).view.mapValues(_.map(t => t._1 -> t._3).toMap).toMap

  def cosSim(a: Map[Long, Double], b: Map[Long, Double]): Double = {
    val dot = a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum
    dot / (math.sqrt(a.values.map(x => x * x).sum) *
      math.sqrt(b.values.map(x => x * x).sum))
  }

  test("itemCosine matches hand math, triangular, sim>0 only") {
    val m = Similarity.itemCosine(ratings, c)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    m.keys.foreach { case (i, j) => assert(i < j) }
    assert(m.values.forall(_ > 0))
    for {
      i <- 1L to 4L; j <- (i + 1) to 4L
      exp = cosSim(byItem(i), byItem(j)) if exp > 0
    } m((i, j)) shouldBe exp +- 1e-12
  }

  test("itemPearson drops degenerate/zero pairs, keeps the rest") {
    val means = byItem.view.mapValues(v => v.values.sum / v.size).toMap
    def centered(i: Long): Map[Long, Double] =
      byItem(i).view.mapValues(_ - means(i)).toMap
    def p(i: Long): Double =
      math.sqrt(centered(i).values.map(x => x * x).sum)
    val m = Similarity.itemPearson(ratings, c)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // i3 is rated 4.0 by both raters → P3 = 0 → every i3 pair is degenerate
    assert(!m.keys.exists { case (i, j) => i == 3 || j == 3 })
    m.keySet shouldBe Set((1L, 2L), (1L, 4L), (2L, 4L))
    for ((i, j) <- m.keySet) {
      val ci = centered(i); val cj = centered(j)
      val dot = ci.keySet.intersect(cj.keySet).toSeq.map(k => ci(k) * cj(k)).sum
      m((i, j)) shouldBe dot / (p(i) * p(j)) +- 1e-12
    }
  }

  test("itemCF: all-items expansion, zero for no-neighbor, zero-event user absent") {
    val model = Similarity.itemCosine(ratings, c)
    val scores = Scoring.itemCF(ratings, model, c)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 4 users with events × 4 items — including already-rated items (§2.3 #1)
    scores.size shouldBe 16
    assert(!scores.keys.exists(_._1 == 5L)) // u5 silently skipped
    // u4 rated only i4; i4's neighbors (i1,i2,i3) were not rated by u4 → 0
    scores((4L, 4L)) shouldBe 0.0
    // u4 scoring i1: only neighbor of i1 rated by u4 is i4 → score = r(u4,i4) = 1
    scores((4L, 1L)) shouldBe 1.0 +- 1e-12
    // u1 scoring i4: full formula over neighbors i1,i2,i3
    val sims = Map(1L -> cosSim(byItem(1), byItem(4)),
      2L -> cosSim(byItem(2), byItem(4)), 3L -> cosSim(byItem(3), byItem(4)))
    val exp = sims.map { case (j, s) => s * byUser(1L)(j) }.sum /
      sims.values.map(math.abs).sum
    scores((1L, 4L)) shouldBe exp +- 1e-12
  }

  test("userCF: deviation from u's OWN average (the Resnick quirk)") {
    val model = Similarity.userCosine(ratings, c)
    val simsOf: Map[(Long, Long), Double] = model.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    val scores = Scoring.userCF(ratings, model, c)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val u = 1L; val i = 4L // u1 never rated i4
    val ubar = byUser(u).values.sum / byUser(u).size
    val raters = byItem(i).keySet.filter(v => simsOf.contains((u, v)))
    val exp = ubar + raters.toSeq.map(v => simsOf((u, v)) * (byItem(i)(v) - ubar)).sum /
      raters.toSeq.map(v => math.abs(simsOf((u, v)))).sum
    scores((u, i)) shouldBe exp +- 1e-12
  }

  test("user-qual pre-filter restricts users but scores ALL items") {
    val model = Similarity.itemCosine(ratings, c)
    val users = Seq(1L).toDF("userid")
    val out = Scoring.itemCF(ratings, model, c, Some(users)).collect()
    out.map(_.getLong(0)).distinct shouldBe Array(1L)
    out.map(_.getLong(1)).sorted shouldBe Array(1L, 2L, 3L, 4L)
  }
}
