package graft

import org.apache.spark.sql.SparkSession
import graft.recdb.EventCols
import graft.sql.{GraftSql, GraftSqlExtensions}

/** Executable walkthrough of the full RecDB workflow — the Spark twin of the
  * reference's example scripts (examples/ml-100/script.py): load an events
  * table, CREATE RECOMMENDER for each method, run RECOMMEND queries (top-k,
  * composition with WHERE/ORDER BY/LIMIT), and DROP — all through the SQL
  * surface a RecDB user already knows.
  *
  * Run: sbt "runMain graft.Example"
  */
object Example {
  def main(args: Array[String]): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft-example").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(e => new GraftSqlExtensions()(e))
      .config(GraftSql.CatalogDirKey, s"$base/catalog")
      .config(GraftSql.ModelsDirKey, s"$base/models")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the events triple, as a view named like the reference's ml_ratings
    Tables.ratings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("ml_ratings")

    // script.py:80-262 — create one recommender per method
    for (m <- Seq("itemCosCF", "itemPearCF", "userCosCF", "userPearCF", "svd")) {
      spark.sql(s"""CREATE RECOMMENDER rec_$m ON ml_ratings USERS FROM userid
                   |ITEMS FROM itemid EVENTS FROM rating USING $m""".stripMargin)
        .show(truncate = false)
    }

    // the regression script's canonical query (recdb_regression_test.sql:5-9):
    // materialized path + relational composition
    println("top-5 itemCosCF recommendations for user 3:")
    spark.sql(
      """SELECT userid, itemid, rating FROM ml_ratings
        |RECOMMEND itemid TO userid ON rating USING itemCosCF
        |WHERE userid = 3 ORDER BY rating DESC LIMIT 5""".stripMargin)
      .show()

    println("userCosCF, score threshold (regression script :42 shape):")
    spark.sql(
      """SELECT userid, itemid, rating FROM ml_ratings
        |RECOMMEND itemid TO userid ON rating USING userCosCF
        |WHERE userid = 3 AND rating >= 60 ORDER BY rating DESC""".stripMargin)
      .show(5)

    // DataFrame API path: same engine, no SQL
    val c = EventCols("userid", "itemid", "rating")
    val r = Tables.ratings(spark, "/root/testdata/sf0.001")
    graft.recdb.Recommender
      .recommend(spark, r, "api", c, "itemPearCF")
      .orderBy(org.apache.spark.sql.functions.desc("score"))
      .show(5)

    for (m <- Seq("itemCosCF", "itemPearCF", "userCosCF", "userPearCF", "svd"))
      spark.sql(s"DROP RECOMMENDER rec_$m").collect()

    // ---- the training-data pipeline, raw corpus → training batches ----
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")

    // curation as one SQL statement (gopher rules → exact dedup →
    // duplicated-span removal → held-out perplexity filter → token budget)
    docs.createOrReplaceTempView("documents_v")
    println("CURATE (SQL): selected docs under a 6000-token budget:")
    spark.sql("CURATE documents_v ID doc_id TEXT text").show(5)

    // the same pipeline composed through to trainer input: BPE learned on
    // the corpus, cleaned selection id-encoded, packed into 64-token
    // sequences, deterministic 2-epoch order, sharded for data loaders
    val merges = graft.ops.Bpe.learnMerges(docs, "doc_id", "text",
      numMerges = 30)
    val manifest = graft.ops.Corpus.trainManifest(docs, "doc_id", "text",
      merges, seqLen = 64, epochs = 2)
    println("training manifest (epoch, seq, ord, tokens, docs):")
    manifest.orderBy("epoch", "ord").show(5)
    println("shard layout (4 sequences per shard):")
    graft.ops.Corpus.shardManifest(manifest, shardSize = 4)
      .orderBy("epoch", "shard_id").show(5)

    println("example complete")
    spark.stop()
  }
}
