package graft

import org.apache.spark.sql.SparkSession

/** Repeat-run profiler: runs each named query `reps` times in one JVM and
  * prints per-run wall clock, separating fixed cost (planning + codegen +
  * JIT, visible as run1 − runN) from steady-state data cost (runN). Usage:
  *   runMain graft.Profile <reps> [queryName ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("p_neardup_jaccard", "p_minhash_lsh", "p_simhash_pairs")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach {
      case "jaccard_stages" => jaccardStages(spark, sfDir, reps)
      case n =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROFILE $n: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }

  /** Decompose jaccardPairs cost: grams eval, explode, self-join, full. */
  def jaccardStages(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextOps}
    val docsDf = Tables.read(spark, sfDir, "documents")
    def t(label: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROFILE stage:$label rows=${times.head._2} " +
        times.map(x => f"${x._1}%.2f").mkString(" "))
    }
    val docs = docsDf.select(col("doc_id").as("id"),
      Dedup.wordNgrams(TextOps.tokens(col("text")), 3).as("grams"))
    t("grams")(docs.count())
    t("grams_eval")(docs.select(sum(size(col("grams")))).head().getLong(0))
    val ex = docs.select(col("id"), explode(col("grams")).as("g"))
    t("explode")(ex.count())
    val inter = ex.select(col("g"), col("id").as("id1"))
      .join(ex.select(col("g"), col("id").as("id2")), Seq("g"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_inter"))
    t("selfjoin_agg")(inter.count())
    t("full")(Dedup.jaccardPairs(docsDf, "doc_id", "text", 3, 0.5).count())
  }
    spark.stop()
  }
}
