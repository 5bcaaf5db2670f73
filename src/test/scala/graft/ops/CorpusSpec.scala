package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  lazy val documents =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("clean pipeline: monotone survivor counts, and no near-dup pair survives") {
    val (kept, stats) = Corpus.clean(documents, "doc_id", "text",
      minQuality = 0.5, langs = Seq("en"), nGram = 3, threshold = 0.5)
    stats.input shouldBe 500L
    stats.afterQuality should be <= stats.input
    stats.afterLang should be <= stats.afterQuality
    stats.afterExact should be <= stats.afterLang
    stats.afterNearDup should be < stats.afterExact // corpus has planted dups
    kept.count() shouldBe stats.afterNearDup
    // kept ⊆ input by id
    kept.join(documents, Seq("doc_id"), "anti").count() shouldBe 0L
    // the defining postcondition: re-running near-dup detection on the
    // cleaned corpus finds nothing at the same threshold
    Dedup.jaccardPairs(kept, "doc_id", "text", 3, 0.5).count() shouldBe 0L
    // language filter really applied
    kept.where(TextOps.langId(col("text")) =!= "en").count() shouldBe 0L
  }
}
