package graft.sql

import graft.SparkSpec
import graft.recdb.{EventCols, MicroFixtureSpec, Scoring, Similarity}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll

/** The RECOMMEND / CREATE RECOMMENDER / DROP RECOMMENDER SQL surface through
  * an extension-enabled session — the regression script's shapes
  * (recdb_regression_test.sql:5-42) against the micro fixture.
  */
class SqlSurfaceSpec extends SparkSpec with BeforeAndAfterAll {

  lazy val ext: SparkSession = {
    SparkSpec.session // ensure the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val base = Files.createTempDirectory("graft-sql").toString
    // `.config("spark.sql.extensions", ...)` is a static conf and only takes
    // effect on a fresh SparkContext; withExtensions is the programmatic
    // route that composes with an existing context (e.g. this shared one).
    val s = SparkSession.builder()
      .withExtensions(e => new GraftSqlExtensions()(e))
      .config(GraftSql.CatalogDirKey, s"$base/catalog")
      .config(GraftSql.ModelsDirKey, s"$base/models")
      .getOrCreate()
    s
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(SparkSpec.session)
    SparkSession.setActiveSession(SparkSpec.session)
    super.afterAll()
  }

  def fixture(s: SparkSession): Unit = {
    val sq = s
    import sq.implicits._
    new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "rating")
      .withColumn("other", org.apache.spark.sql.functions.lit(9.9))
      .createOrReplaceTempView("ml_ratings")
  }

  test("RECOMMEND clause: on-the-fly scoring, synthesized-tuple quirks, top-k") {
    fixture(ext)
    val out = ext.sql(
      """SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON rating
        |USING itemCosCF WHERE userid = 1 ORDER BY rating DESC LIMIT 2""".stripMargin)
    val rows = out.collect()
    rows.length shouldBe 2
    out.columns.toSeq shouldBe Seq("userid", "itemid", "rating", "other")
    rows.foreach { r =>
      r.getLong(0) shouldBe 1L
      r.getDouble(3) shouldBe 0.0 // non-RECOMMEND columns read 0 (§2.3 #2)
    }
    // scores agree with the API path
    val c = EventCols("userid", "itemid", "rating")
    val ratings = new MicroFixtureSpec {}.fixture
      .map(t => (t._1, t._2, t._3))
    val sq = ext
    import sq.implicits._
    val rdf = ratings.toDF("userid", "itemid", "rating")
    val api = Scoring.itemCF(rdf, Similarity.itemCosine(rdf, c), c)
      .where($"userid" === 1).orderBy($"score".desc).limit(2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq shouldBe api.toSeq
  }

  test("CREATE/DROP RECOMMENDER statements drive the catalog") {
    fixture(ext)
    ext.sql("""CREATE RECOMMENDER rec1 ON ml_ratings USERS FROM userid
              |ITEMS FROM itemid EVENTS FROM rating USING itemCosCF""".stripMargin)
      .collect()
    GraftSql.catalog(ext).get("rec1").map(_.eventTotal) shouldBe Some(10L)
    // materialized path now serves the same query — and returns ONLY the
    // three clause columns (README.md:110, SURVEY.md §2.3 #3)
    val matDf = ext.sql(
      """SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON rating
        |USING itemCosCF WHERE userid = 2""".stripMargin)
    matDf.columns.toSeq shouldBe Seq("userid", "itemid", "rating")
    val out = matDf.collect()
    out.length shouldBe 4 // all items for user 2
    GraftSql.catalog(ext).get("rec1").map(_.queryCounter) shouldBe Some(1L)
    ext.sql("DROP RECOMMENDER rec1").collect()
    GraftSql.catalog(ext).get("rec1") shouldBe None
    an[Exception] should be thrownBy ext.sql("DROP RECOMMENDER rec1").collect()
  }

  test("legacy Recathon workload syntax: FROM <rec> RECOMMEND(k) userid = r") {
    fixture(ext)
    ext.sql("""CREATE RECOMMENDER rec_legacy ON ml_ratings USERS FROM userid
              |ITEMS FROM itemid EVENTS FROM rating USING itemCosCF""".stripMargin)
      .collect()
    // the reference's rec_workload.c query shape, verbatim
    val out = ext.sql("SELECT itemid FROM rec_legacy RECOMMEND(3) userid = 2")
      .collect().map(_.getLong(0))
    out.length shouldBe 3
    // equivalent modern-clause top-3 for the same user
    val expected = ext.sql(
      """SELECT itemid FROM ml_ratings RECOMMEND itemid TO userid ON rating
        |USING itemCosCF WHERE userid = 2
        |ORDER BY rating DESC, itemid LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0))
    out.sorted shouldBe expected.sorted
    // unknown recommender name fails like the reference
    an[Exception] should be thrownBy
      ext.sql("SELECT itemid FROM nope_rec RECOMMEND(3) userid = 2").collect()
    ext.sql("DROP RECOMMENDER rec_legacy").collect()
  }

  test("user-qual pre-filter: mixed WHERE prunes users yet keeps full filter") {
    fixture(ext)
    // userid = 2 is extractable (user-only); rating > 1.2 must still apply on
    // top of the scored view (the reference's noFilter path, §2.3 #7/#8)
    val out = ext.sql(
      """SELECT userid, itemid, rating FROM ml_ratings
        |RECOMMEND itemid TO userid ON rating USING itemCosCF
        |WHERE userid = 2 AND rating > 1.2""".stripMargin).collect()
    out.foreach { r =>
      r.getLong(0) shouldBe 2L
      r.getDouble(2) should be > 1.2
    }
    // parity with unpruned computation + post-filter
    val sq = ext
    import sq.implicits._
    val rdf = new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "rating")
    val c = EventCols("userid", "itemid", "rating")
    val full = Scoring.itemCF(rdf, Similarity.itemCosine(rdf, c), c)
      .where($"userid" === 2 && $"score" > 1.2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val got = out.map(r => (r.getLong(1), r.getDouble(2))).toMap
    got.keySet shouldBe full.keySet
    got.foreach { case (k, v) => v shouldBe full(k) +- 1e-9 } // ULP-order drift
    // and the extraction itself finds the user-only conjunct
    val q = GraftSql.userQual(ext,
      "SELECT * FROM t WHERE userid = 2 AND rating > 1.2 ORDER BY 1", "userid")
    q.isDefined shouldBe true
  }

  test("native expressions are callable as SQL functions") {
    val sq = ext
    import sq.implicits._
    Seq((1L, "a b c a b c"), (2L, "x y")).toDF("id", "text")
      .createOrReplaceTempView("fn_docs")
    val r = ext.sql(
      """SELECT id, size(graft_word_shingles(text, 2)) AS n2,
        |  graft_simhash63(text) AS sh,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
        |FROM fn_docs ORDER BY id""".stripMargin).collect()
    r(0).getInt(1) shouldBe 3 // distinct bigrams of "a b c a b c": ab, bc, ca
    r(1).getInt(1) shouldBe 1 // "x y" -> one bigram
    r(0).getLong(2) should not be 0L
    r(0).getDouble(3) shouldBe 11.0
    val dense = ext.sql(
      """SELECT graft_dense_from_entries(
        |  array(struct(1, 5.0d), struct(3, 7.0d)), 5) AS v""".stripMargin)
      .head().getSeq[Double](0)
    dense shouldBe Seq(0.0, 5.0, 0.0, 7.0, 0.0)
  }

  test("non-RECOMMEND SQL is untouched by the injected parser") {
    fixture(ext)
    ext.sql("SELECT count(*) AS n FROM ml_ratings").head().getLong(0) shouldBe 10L
  }
}
