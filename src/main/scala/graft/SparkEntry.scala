package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.recdb.{Scoring, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and returns a DataFrame whose column
  * names match its oracle SQL exactly (the driver sorts columns by name and
  * hashes values). Float-bearing outputs are rounded to 6 decimals on BOTH
  * sides so double-summation order differences between Spark and DuckDB
  * cannot flip the hash.
  */
object SparkEntry {
  private val c = Tables.ratingCols

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The regression script's canonical shape (recdb_regression_test.sql:5-9):
    * top-10 itemCF recommendations for one user.
    */
  def entry(spark: SparkSession): DataFrame =
    itemCfTopk(spark, "/root/testdata/sf0.001")

  private def ratings(spark: SparkSession, dir: String): DataFrame =
    Tables.ratings(spark, dir)

  private def itemCfScores(spark: SparkSession, dir: String): DataFrame = {
    val r = ratings(spark, dir).cache()
    Scoring.itemCF(r, Similarity.itemCosine(r, c), c)
  }

  private def itemCfTopk(spark: SparkSession, dir: String): DataFrame = {
    val r = ratings(spark, dir).cache()
    val minUser = r.agg(min(col("userid"))).head().getLong(0)
    // user-qual pre-filter BEFORE the user×item expansion — the reference's
    // userqual pruning (execRecommend.c:442-468, SURVEY.md §4.2.4)
    val users = r.select(col("userid")).where(col("userid") === minUser).distinct()
    val scored = Scoring.itemCF(r, Similarity.itemCosine(r, c), c, Some(users))
    scored.select(col("userid"), col("itemid"), round(col("score"), 6).as("score"))
      .orderBy(round(col("score"), 6).desc, col("itemid"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_itemcos_model" -> ((s, dir) =>
      Similarity.itemCosine(ratings(s, dir), c)
        .select(col("item1"), col("item2"), round(col("similarity"), 6).as("similarity"))),
    "r_itemcf_scores" -> ((s, dir) =>
      itemCfScores(s, dir)
        .select(col("userid"), col("itemid"), round(col("score"), 6).as("score"))),
    "r_itemcf_topk" -> ((s, dir) => itemCfTopk(s, dir)),
  )

  private val ratingsCte = Tables.ratingsSql

  private val itemCosCte =
    s"""$ratingsCte,
       |norms AS (
       |  SELECT itemid, sqrt(sum(rating*rating)) AS nrm FROM ratings GROUP BY 1
       |),
       |dots AS (
       |  SELECT a.itemid AS item1, b.itemid AS item2, sum(a.rating*b.rating) AS dot
       |  FROM ratings a JOIN ratings b ON a.userid = b.userid AND a.itemid < b.itemid
       |  GROUP BY 1, 2
       |),
       |model AS (
       |  SELECT d.item1, d.item2, d.dot/(n1.nrm*n2.nrm) AS s
       |  FROM dots d
       |  JOIN norms n1 ON d.item1 = n1.itemid
       |  JOIN norms n2 ON d.item2 = n2.itemid
       |  WHERE d.dot/(n1.nrm*n2.nrm) > 0
       |)""".stripMargin

  private val itemCfScoresCte =
    s"""$itemCosCte,
       |sym AS (
       |  SELECT item1 AS i, item2 AS j, s FROM model
       |  UNION ALL
       |  SELECT item2 AS i, item1 AS j, s FROM model
       |),
       |scores AS (
       |  SELECT r.userid, sym.i AS itemid, sum(sym.s*r.rating)/sum(abs(sym.s)) AS score
       |  FROM sym JOIN ratings r ON sym.j = r.itemid
       |  GROUP BY 1, 2
       |),
       |pairs AS (
       |  SELECT u.userid, i.itemid
       |  FROM (SELECT DISTINCT userid FROM ratings) u
       |  CROSS JOIN (SELECT DISTINCT itemid FROM ratings) i
       |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "r_itemcos_model" ->
      s"""WITH $itemCosCte
         |SELECT item1, item2, round(s, 6) AS similarity FROM model""".stripMargin,
    "r_itemcf_scores" ->
      s"""WITH $itemCfScoresCte
         |SELECT p.userid, p.itemid, round(coalesce(sc.score, 0), 6) AS score
         |FROM pairs p
         |LEFT JOIN scores sc ON p.userid = sc.userid AND p.itemid = sc.itemid""".stripMargin,
    "r_itemcf_topk" ->
      s"""WITH $itemCfScoresCte
         |SELECT p.userid, p.itemid, round(coalesce(sc.score, 0), 6) AS score
         |FROM pairs p
         |LEFT JOIN scores sc ON p.userid = sc.userid AND p.itemid = sc.itemid
         |WHERE p.userid = (SELECT min(userid) FROM ratings)
         |ORDER BY round(coalesce(sc.score, 0), 6) DESC, p.itemid
         |LIMIT 10""".stripMargin,
  )
}
