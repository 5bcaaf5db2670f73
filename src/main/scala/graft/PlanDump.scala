package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named gates to files — the
  * plans/<round>/ evidence the optimization rounds commit. Usage:
  *   runMain graft.PlanDump <outDir> <suffix> <gate1,gate2,...>
  * Writes <outDir>/<gate>_<suffix>.txt for each gate. Reads the data dir
  * from SPARK_GRAFT_SF_DIR and cores from SPARK_GRAFT_CPUS like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // pseudo-gates: the ANN ingest's cell-partitioned write input plan —
    // the frame processBatch hands to the dynamic-partition writer. The
    // round-16 fix shows up as the Exchange node: REPARTITION_BY_COL
    // (bare repartition(col), AQE-coalescible to 1-2 tasks — the BEFORE
    // shape) vs REPARTITION_BY_NUM at defaultParallelism (the AFTER
    // shape, what BatchDirs.clusterForWrite emits).
    def ingestWritePlan(explicitCount: Boolean): String = {
      import org.apache.spark.sql.functions._
      val cents = PipelineQueries.hybridCentsProbe(spark, sfDir)
      val assigned = Tables.read(spark, sfDir, "documents")
        .where(col("doc_id") >= 25 && col("doc_id") < 2000)
        .select(col("doc_id").cast("long").as("id"),
          graft.ops.TextOps.textEmbedding(col("text"), 8)
            .cast("array<double>").as("v"))
        .withColumn("batch_id", lit(0L))
        .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
          col("v"), cents, 6))
      val clustered =
        if (explicitCount) assigned.repartition(
          math.max(1, spark.sparkContext.defaultParallelism), col("cell"))
        else assigned.repartition(col("cell"))
      clustered.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
    }
    names.foreach { n =>
      val plan =
        try {
          if (n == "__ingest_write_bare") ingestWritePlan(false)
          else if (n == "__ingest_write_explicit") ingestWritePlan(true)
          else SparkEntry.queries(n)(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR building plan: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      System.err.println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
