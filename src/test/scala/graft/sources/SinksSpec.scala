package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("upsertByKey: latest version wins across repeated merges") {
    val dir = Files.createTempDirectory("graft-upsert").toString + "/t"
    val v1 = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "ver")
    EventSources.upsertByKey(spark, dir, v1, Seq("k"), "ver")
    val v2 = Seq((2L, "B", 2L), (4L, "d", 2L)).toDF("k", "v", "ver")
    EventSources.upsertByKey(spark, dir, v2, Seq("k"), "ver")
    val v3 = Seq((2L, "ignored-older", 0L)).toDF("k", "v", "ver")
    EventSources.upsertByKey(spark, dir, v3, Seq("k"), "ver")
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d")
  }
}
