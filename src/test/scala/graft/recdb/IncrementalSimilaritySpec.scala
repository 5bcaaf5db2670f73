package graft.recdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental state merges must reproduce the full rebuild exactly (up to
  * float summation order).
  */
class IncrementalSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def modelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("itemCosine state: init + 2 delta merges == full build") {
    val rnd = new scala.util.Random(11)
    val all = (1 to 600).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(25).toLong, rnd.nextInt(5) + 1.0, i)
    }
    // unique (user,item) observations — the append-only contract
    val uniq = all.groupBy(t => (t._1, t._2)).values.map(_.head).toSeq
      .sortBy(_._4)
    val (b0, rest) = uniq.splitAt(uniq.size / 3)
    val (b1, b2) = rest.splitAt(rest.size / 2)
    def df(s: Seq[(Long, Long, Double, Int)]) =
      s.map(t => (t._1, t._2, t._3)).toDF("userid", "itemid", "rating")
    val c = EventCols()

    val full = modelMap(Similarity.itemCosine(df(uniq), c)
      .select(col("item1"), col("item2"), col("similarity")))

    var state = IncrementalSimilarity.itemCosineState(df(b0), c)
    state = IncrementalSimilarity.updateItemCosineState(state, df(b0), df(b1), c)
    state = IncrementalSimilarity.updateItemCosineState(
      state, df(b0 ++ b1), df(b2), c)
    val inc = modelMap(
      IncrementalSimilarity.cosineFromState(state, "item1", "item2"))

    inc.keySet shouldBe full.keySet
    inc.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 }
  }

  test("itemPearson state: init + 2 delta merges == full build (means shift)") {
    val rnd = new scala.util.Random(23)
    val all = (1 to 600).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(25).toLong, rnd.nextInt(5) + 1.0, i)
    }
    val uniq = all.groupBy(t => (t._1, t._2)).values.map(_.head).toSeq
      .sortBy(_._4)
    val (b0, rest) = uniq.splitAt(uniq.size / 3)
    val (b1, b2) = rest.splitAt(rest.size / 2)
    def df(s: Seq[(Long, Long, Double, Int)]) =
      s.map(t => (t._1, t._2, t._3)).toDF("userid", "itemid", "rating")
    val c = EventCols()

    val full = modelMap(Similarity.itemPearson(df(uniq), c)
      .select(col("item1"), col("item2"), col("similarity")))

    var state = IncrementalSimilarity.itemPearsonState(df(b0), c)
    state = IncrementalSimilarity.updateItemPearsonState(state, df(b0), df(b1), c)
    state = IncrementalSimilarity.updateItemPearsonState(
      state, df(b0 ++ b1), df(b2), c)
    val inc = modelMap(
      IncrementalSimilarity.pearsonFromState(state, "item1", "item2"))

    inc.keySet shouldBe full.keySet
    inc.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 }
  }

  test("userPearson state: transpose variant matches full build") {
    val events = Seq(
      (1L, 10L, 4.0), (1L, 11L, 2.0), (2L, 10L, 5.0), (2L, 12L, 1.0),
      (3L, 11L, 3.0), (3L, 12L, 4.0), (4L, 10L, 2.0), (1L, 12L, 3.0),
      (4L, 11L, 5.0))
      .toDF("userid", "itemid", "rating")
    val c = EventCols()
    val (h, d) = (events.where(col("itemid") =!= 12L),
      events.where(col("itemid") === 12L))
    var state = IncrementalSimilarity.userPearsonState(h, c)
    state = IncrementalSimilarity.updateUserPearsonState(state, h, d, c)
    val inc = modelMap(
      IncrementalSimilarity.pearsonFromState(state, "user1", "user2"))
    val full = modelMap(Similarity.userPearson(events, c)
      .select(col("user1"), col("user2"), col("similarity")))
    inc.keySet shouldBe full.keySet
    inc.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 }
  }

  test("userCosine state: transpose variant matches full build") {
    val events = Seq(
      (1L, 10L, 4.0), (1L, 11L, 2.0), (2L, 10L, 5.0), (2L, 12L, 1.0),
      (3L, 11L, 3.0), (3L, 12L, 4.0), (4L, 10L, 2.0))
      .toDF("userid", "itemid", "rating")
    val c = EventCols()
    val (h, d) = (events.where(col("itemid") =!= 12L),
      events.where(col("itemid") === 12L))
    var state = IncrementalSimilarity.userCosineState(h, c)
    state = IncrementalSimilarity.updateUserCosineState(state, h, d, c)
    val inc = modelMap(
      IncrementalSimilarity.cosineFromState(state, "user1", "user2"))
    val full = modelMap(Similarity.userCosine(events, c)
      .select(col("user1"), col("user2"), col("similarity")))
    inc.keySet shouldBe full.keySet
    inc.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 }
  }
}
