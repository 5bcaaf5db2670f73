package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated name-prefix filter (local fast
    // checks of one gate family; the driver always runs the full set)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Seq[String]] =
      args.drop(2).headOption.map(_.split(',').toSeq)
    def wanted(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS); read as long ns since epoch
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.filter(e => wanted(e._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors += name -> String.valueOf(e.getMessage).take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // late-bound artifact paths: some oracles read parquet the gate itself
    // persisted (e.g. SVD factor tables), at a location keyed by the sf dir
    // only known here
    val json = SparkEntry.oracleSql
      .filter(e => wanted(e._1))
      .map { case (k, v) =>
        val sql = v
          .replace("__SVD_FACTORS__", RecQueries.svdFactorBase(sfDir))
          .replace("__ANN_ARTIFACTS__", PipelineQueries.annArtifactBase(sfDir))
          .replace("__BPE_ARTIFACTS__", PipelineQueries.bpeArtifactBase(sfDir))
          .replace("__NEG_DRAWS__", RecQueries.negDrawsBase(sfDir))
        s"${q(k)}: ${q(sql)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // failures as a first-class artifact: a query that throws otherwise
    // just VANISHES from the correctness report (no parquet dir → no row),
    // which is how a round-6 schema drift silently dropped five gates —
    // stderr scrolls away, _errors.json does not
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} FAILED: " +
        errors.keys.mkString(","))
    spark.stop()
  }
}
