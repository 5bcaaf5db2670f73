package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for selected queries so
  * plan regressions (missing broadcast, lost pushdown, extra shuffles) are
  * visible. Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join", "r_itemcos_model", "r_itemcf_topk",
        "p_knn_brute", "q_asof", "q_range", "p_dup_groups", "p_minhash_lsh",
        "p_bpe_encode", "r_negatives_rej", "p_resize_features",
        "p_substr_dedup", "p_semdedup", "p_pack_tokens", "p_curate_pipeline")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
