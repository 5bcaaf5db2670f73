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
    // dimension table for the regression file's join form
    Seq((1L, "Alpha", "drama"), (2L, "Beta", "action"), (3L, "Gamma", "drama"),
      (4L, "Delta", "comedy"))
      .toDF("itemid", "name", "genre").createOrReplaceTempView("ml_items")
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
    // and the extraction itself finds the user-only conjunct, with a
    // job-free single-user estimate from the equality shape
    val (q, est) = GraftSql.userQual(ext,
      "userid = 2 AND rating > 1.2", "userid", Set.empty)
    q.isDefined shouldBe true
    est shouldBe Some(1L)
  }

  test("native expressions are callable as SQL functions") {
    val sq = ext
    import sq.implicits._
    Seq((1L, "a b c a b c"), (2L, "x y")).toDF("id", "text")
      .createOrReplaceTempView("fn_docs")
    val r = ext.sql(
      """SELECT id, size(graft_word_shingles(text, 2)) AS n2,
        |  graft_simhash60(text) AS sh,
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

  test("Column-composed pipeline operators are callable as SQL functions") {
    val sq = ext
    import sq.implicits._
    Seq((1L, "the data of this table is a clean value with many words here now",
        "<p>a &amp; b</p>",
        "mail me at a@b.com or call 12345678901"))
      .toDF("id", "text", "html", "pii")
      .createOrReplaceTempView("pipe_docs")
    val r = ext.sql(
      """SELECT graft_quality(text) AS q, graft_langid(text) AS lang,
        |  graft_fingerprint(text) AS fp,
        |  graft_extract_html(html) AS ex,
        |  graft_redact(pii) AS red,
        |  graft_normalize('  a   b ') AS norm
        |FROM pipe_docs""".stripMargin).head()
    r.getDouble(0) should be >= 0.5
    r.getString(1) shouldBe "en"
    r.getLong(2) should not be 0L
    r.getString(3) shouldBe "a & b"
    r.getString(4) should not include "a@b.com"
    r.getString(4) should not include "12345678901"
    r.getString(5) shouldBe "a b"
  }

  test("non-RECOMMEND SQL is untouched by the injected parser") {
    fixture(ext)
    ext.sql("SELECT count(*) AS n FROM ml_ratings").head().getLong(0) shouldBe 10L
  }

  test("join/alias form: the regression file's Miscellaneous queries run verbatim") {
    fixture(ext)
    // recdb_regression_test.sql:39 (adapted only in table contents): aliased
    // FROM list, alias-qualified clause columns, dimension join + ILIKE
    val out = ext.sql(
      """SELECT r.itemid,r.rating,i.name,i.genre FROM ml_ratings r, ml_items i
        |RECOMMEND r.itemid TO r.userid ON r.rating USING itemcoscf
        |WHERE r.userid = 1 AND r.itemid = i.itemid AND i.genre ILIKE '%drama%'"""
        .stripMargin).collect()
    out.map(_.getString(3)).distinct.toSeq shouldBe Seq("drama")
    out.map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 3L) // drama items
    // recdb_regression_test.sql:41: same with ORDER BY/LIMIT on top
    val top = ext.sql(
      """SELECT r.itemid,r.rating,i.name,i.genre FROM ml_ratings r, ml_items i
        |RECOMMEND r.itemid TO r.userid ON r.rating USING itemcoscf
        |WHERE r.userid = 1 AND r.itemid = i.itemid AND i.genre ILIKE '%action%'
        |ORDER BY rating DESC LIMIT 5""".stripMargin).collect()
    top.map(_.getString(3)).distinct.toSeq shouldBe Seq("action")
    // scores agree with the API path composed the same way
    val sq = ext
    import sq.implicits._
    val rdf = new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "rating")
    val c = EventCols("userid", "itemid", "rating")
    val api = Scoring.itemCF(rdf, Similarity.itemCosine(rdf, c), c)
      .where($"userid" === 1 && $"itemid".isin(1L, 3L))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out.map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe api
  }

  test("example-script shape: three-table join (item + user dims), ILIKE, ORDER BY LIMIT") {
    // the reference distribution's flagship usage
    // (examples/MoiveLens/script.py: ratings r, moive i, users b RECOMMEND
    // ... ILIKE ... ORDER BY rating DESC LIMIT n) — shape preserved
    // verbatim over this fixture's tables
    fixture(ext)
    val sq = ext
    import sq.implicits._
    Seq((1L, "Ann", 34L), (2L, "Bob", 28L), (3L, "Cal", 41L))
      .toDF("userid", "uname", "age").createOrReplaceTempView("ml_users")
    val out = ext.sql(
      """SELECT r.itemid, i.name, i.genre, r.rating, r.userid, b.age
        |FROM ml_ratings r, ml_items i, ml_users b
        |RECOMMEND r.itemid TO r.userid ON r.rating USING itemcoscf
        |WHERE r.userid = 1 AND r.userid = b.userid AND r.itemid = i.itemid
        |  AND i.genre ILIKE '%drama%'
        |ORDER BY rating DESC LIMIT 10""".stripMargin).collect()
    out should not be empty
    out.foreach { r =>
      r.getLong(4) shouldBe 1L // user qual
      r.getLong(5) shouldBe 34L // user-dim join row
      r.getString(2) shouldBe "drama" // item-dim ILIKE
    }
    // descending by predicted rating
    val scores = out.map(_.getDouble(3)).toSeq
    scores shouldBe scores.sorted.reverse
    // scores agree with the API path composed the same way
    val rdf = new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "rating")
    val c = EventCols("userid", "itemid", "rating")
    val api = Scoring.itemCF(rdf, Similarity.itemCosine(rdf, c), c)
      .where($"userid" === 1 && $"itemid".isin(1L, 3L))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out.map(r => r.getLong(0) -> r.getDouble(3)).toMap shouldBe api
  }

  test("RECOMMEND parse is pure: no temp views, no catalog bumps at parse") {
    fixture(ext)
    ext.sql("""CREATE RECOMMENDER rec_pure ON ml_ratings USERS FROM userid
              |ITEMS FROM itemid EVENTS FROM rating USING itemCosCF""".stripMargin)
      .collect()
    val viewsBefore = ext.catalog.listTables().collect().map(_.name).toSet
    // parsePlan directly — plan construction must not register views
    ext.sessionState.sqlParser.parsePlan(
      """SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON rating
        |USING itemCosCF WHERE userid = 2""".stripMargin)
    val viewsAfter = ext.catalog.listTables().collect().map(_.name).toSet
    viewsAfter shouldBe viewsBefore
    ext.sql("DROP RECOMMENDER rec_pure").collect()
  }

  test("EXPLAIN of a materialized RECOMMEND query runs zero Spark jobs") {
    fixture(ext)
    ext.sql("""CREATE RECOMMENDER rec_explain ON ml_ratings USERS FROM userid
              |ITEMS FROM itemid EVENTS FROM rating USING itemCosCF""".stripMargin)
      .collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val sc = ext.sparkContext
    sc.addSparkListener(listener)
    try {
      ext.sql(
        """EXPLAIN EXTENDED SELECT * FROM ml_ratings
          |RECOMMEND itemid TO userid ON rating USING itemCosCF
          |WHERE userid = 2 ORDER BY rating DESC LIMIT 3""".stripMargin)
        .collect()
      Thread.sleep(1000) // listener bus is async
      jobs.get() shouldBe 0
    } finally {
      sc.removeSparkListener(listener)
      ext.sql("DROP RECOMMENDER rec_explain").collect()
    }
  }

  test("forbidden clauses are rejected with the reference's errors") {
    fixture(ext)
    def err(sql: String): String =
      intercept[Exception](ext.sql(sql).collect()).getMessage
    val base = "FROM ml_ratings RECOMMEND itemid TO userid ON rating USING itemcoscf"
    err(s"SELECT DISTINCT itemid $base WHERE userid = 1") should
      include("not allowed with DISTINCT clause")
    err(s"SELECT userid, max(rating) $base GROUP BY userid") should
      include("not allowed with GROUP BY clause")
    err(s"SELECT userid, max(rating) $base GROUP BY userid HAVING max(rating) > 1") should
      include("not allowed with")
    err(s"WITH x AS (SELECT 1 AS one) SELECT itemid $base WHERE userid = 1") should
      include("not allowed with WITH clause")
    err("SELECT rank() OVER w AS r FROM ml_ratings RECOMMEND itemid TO userid " +
      "ON rating USING itemcoscf WINDOW w AS (ORDER BY rating)") should
      include("not allowed with WINDOW clause")
    // parse_rec.c:130-133 / :147-150 — clauses Spark SQL cannot even parse
    // still get the REFERENCE's messages, not a generic parser error
    err(s"SELECT itemid INTO newtbl $base WHERE userid = 1") should
      include("not allowed with INTO clause")
    err(s"SELECT itemid $base WHERE userid = 1 FOR UPDATE") should
      include("not allowed with FOR clause")
    err(s"SELECT itemid $base WHERE userid = 1 FOR SHARE") should
      include("not allowed with FOR clause")
    // a column merely NAMED into/for must not trip the text check
    ext.sql(s"SELECT itemid AS into_col $base WHERE userid = 1")
      .collect().length should be > 0
  }

  test("RECOMMEND inside a string literal does not trigger the clause") {
    fixture(ext)
    val out = ext.sql(
      """SELECT 'FROM t RECOMMEND a TO b ON c USING d' AS s,
        |count(*) AS n FROM ml_ratings GROUP BY 1""".stripMargin).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 10L
  }

  test("unqualified clause columns with a multi-table FROM probe schemas") {
    fixture(ext)
    val sq = ext
    import sq.implicits._
    // a dimension table with NO overlapping column names, so the bare clause
    // columns stay unambiguous after the splice (Spark resolution); the
    // PROBE still has to pick ml_ratings as the events table
    Seq((1L, "drama"), (2L, "action"), (3L, "drama"), (4L, "comedy"))
      .toDF("gid", "g").createOrReplaceTempView("genre_dim")
    val out = ext.sql(
      """SELECT itemid, rating, g FROM ml_ratings, genre_dim d
        |RECOMMEND itemid TO userid ON rating USING itemcoscf
        |WHERE userid = 1 AND itemid = d.gid""".stripMargin)
    out.collect().length shouldBe 4
    // mismatched qualifiers error like the reference
    val e = intercept[Exception](ext.sql(
      """SELECT * FROM ml_ratings r, ml_items i
        |RECOMMEND r.itemid TO i.userid ON r.rating USING itemcoscf"""
        .stripMargin))
    e.getMessage should include("matching table references")
  }

  test("native text functions are injected into the extension session") {
    val row = ext.sql(
      "SELECT graft_fold_accents(graft_nfc('café')) AS f, " +
        "size(graft_char_shingles('abcdef', 5)) AS n, " +
        "round(graft_char_entropy('aabb'), 6) AS e").head()
    row.getString(0) shouldBe "cafe"
    row.getInt(1) shouldBe 2
    row.getDouble(2) shouldBe 1.0
  }

  test("CURATE statement: the composed pipeline as one SQL statement") {
    val sq = ext
    import sq.implicits._
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega",
      "sigma")
    def sentence(seed: Int): String = {
      // per-doc RNG: docs share words but almost never 30-char runs, so
      // span removal trims noise instead of erasing the corpus
      val rnd = new scala.util.Random(seed)
      ("the" +: (0 until 29).map(_ => words(rnd.nextInt(words.length))))
        .mkString(" ")
    }
    val docsDf = (0L until 40L).map(i => (i, sentence(i.toInt)))
      .toDF("doc_id", "text")
    docsDf.createOrReplaceTempView("curate_docs")
    val viaSql = ext.sql(
      "CURATE curate_docs ID doc_id TEXT text WIDTH 30 PPL 9.0 BUDGET 400")
    viaSql.columns.toSeq shouldBe Seq("doc_id", "n_tok", "avg_nll", "cum_tok")
    val direct = graft.ops.Corpus.curate(docsDf, "doc_id", "text", 30, 9.0, 400L)
    viaSql.collect().toSet shouldBe direct.collect().toSet
    viaSql.count() should be > 0L
    // omitted knobs take the documented defaults
    val defaults = ext.sql("CURATE curate_docs ID doc_id TEXT text")
    val explicit = ext.sql(
      "CURATE curate_docs ID doc_id TEXT text WIDTH 30 PPL 3.43 BUDGET 6000")
    defaults.collect().toSet shouldBe explicit.collect().toSet
  }
}
