package graft.recdb

import graft.SparkSpec
import graft.Tables

/** Metric gate on real testdata: CF and SVD recommenders must beat a random
  * ranker's expected hit-rate by a wide margin (the acc_test.c protocol).
  */
class EvalSpec extends SparkSpec {

  val c: EventCols = EventCols("userid", "itemid", "rating")

  test("holdout split is deterministic and disjoint") {
    val ev = Tables.ratings(spark, "/root/testdata/sf0.001")
    val (train, test) = Eval.holdoutSplit(ev, c, holdoutPerUser = 2)
    train.count() + test.count() shouldBe ev.count()
    test.join(train, Seq("userid", "itemid"), "semi").count() shouldBe 0
    val again = Eval.holdoutSplit(ev, c, holdoutPerUser = 2)._2
    again.except(test).count() shouldBe 0
  }

  test("itemCF beats random ranking at k=10; ALS reconstructs better than mean") {
    import org.apache.spark.sql.functions._
    val ev = Tables.ratings(spark, "/root/testdata/sf0.001").cache()
    val (train, test) = Eval.holdoutSplit(ev, c)
    val nItems = ev.select("itemid").distinct().count()
    val randomBaseline = 10.0 / nItems // expected hit-rate of a random top-10
    val cf = Scoring.itemCF(train, Similarity.itemCosine(train, c), c)
    val cfHr = Eval.hitRateAtK(cf, train, test, c, 10)
    info(s"hit-rate@10: itemCF=$cfHr random=$randomBaseline")
    cfHr should be > randomBaseline
    // ALS gate: factorization must fit the observed matrix far better than
    // the global-mean predictor (rank-50 on a dense small matrix ⇒ near-exact)
    val (uf, itf) = FunkSVD.train(train, c)
    val pred = Scoring.factorScore(uf, itf, c)
    val joined = train.join(pred, Seq("userid", "itemid")).cache()
    val alsRmse = math.sqrt(joined
      .select(avg(pow(col("rating") - col("score"), 2))).head().getDouble(0))
    val meanRmse = math.sqrt(train
      .select(var_pop(col("rating"))).head().getDouble(0))
    info(s"train RMSE: als=$alsRmse meanPredictor=$meanRmse")
    alsRmse should be < meanRmse * 0.5
  }

  test("ndcg@k: bounded by 1, perfect ranking scores 1, beats random for itemCF") {
    import org.apache.spark.sql.functions._
    val ev = Tables.ratings(spark, "/root/testdata/sf0.001").cache()
    val (train, test) = Eval.holdoutSplit(ev, c)
    val cf = Scoring.itemCF(train, Similarity.itemCosine(train, c), c)
    val n = Eval.ndcgAtK(cf, train, test, c, 10)
    info(s"ndcg@10: itemCF=$n")
    n should be > 0.0
    n should be <= 1.0
    // a scoring that ranks exactly the held-out items first gets NDCG 1
    val oracleScores = ev.select(col("userid"), col("itemid"))
      .join(test.select(col("userid"), col("itemid"))
        .withColumn("score", lit(10.0)), Seq("userid", "itemid"), "left")
      .select(col("userid"), col("itemid"), coalesce(col("score"), lit(0.0)).as("score"))
    Eval.ndcgAtK(oracleScores, train, test, c, 10) shouldBe 1.0 +- 1e-9
  }

  test("negative sampling: never a positive, exactly k per user, layout-stable") {
    val ev = graft.Tables.ratings(spark, "/root/testdata/sf0.01")
    val c = graft.Tables.ratingCols
    for (neg <- Seq(Eval.negativeSamples(ev, c, 5),
        Eval.negativeSamplesRejection(ev, c, 5, trials = 64))) {
      // a sampled negative must never be a rated pair
      neg.join(ev, Seq(c.user, c.item), "semi").count() shouldBe 0L
      // every user gets exactly k (catalog is far larger than any rated set)
      val perUser = neg.groupBy(c.user).count().select("count")
        .distinct().collect().map(_.getLong(0)).toSeq
      perUser shouldBe Seq(5L)
      neg.groupBy(c.user).count().count() shouldBe
        ev.select(c.user).distinct().count()
    }
    // determinism across partition layouts (the md5/xxhash draw contract)
    val a = Eval.negativeSamplesRejection(ev, c, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Eval.negativeSamplesRejection(ev.repartition(7), c, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    a shouldBe b
  }
}
