package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque BINARY payloads + typed metadata, with batch decode / feature
  * extraction as partition-parallel operators.
  *
  * The REAL parts (tested): the schema contract, the partition-parallel
  * batched execution shape (the Scala equivalent of `mapInPandas` — an
  * iterator of fixed-size batches per partition, so a vectorized decoder
  * amortizes per-batch setup), resize/frame-sample parameter plumbing, and
  * deterministic output schemas.
  *
  * The STUBBED part: actual media codecs are not available in this container,
  * so [[decodeBatchStub]] produces deterministic fake feature vectors derived
  * from the payload bytes. Swap `decodeBatchStub` for a real JNI/FFI batch
  * decoder at deployment; nothing else changes.
  */
object Multimodal {

  /** (media_id, kind, payload, width, height, sample_rate, n_frames). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Deterministic synthetic media table (payload bytes derived from id) for
    * tests and benchmarks.
    */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val payload = Array.tabulate[Byte](256)(j => ((i * 31 + j * 7) % 251).toByte)
      (i.toLong, kind, payload, 64, 48, 16000, 32)
    }
    rows.toDF("media_id", "kind", "payload", "width", "height",
      "sample_rate", "n_frames")
  }

  /** STUB batch decoder: deterministic pseudo-features from payload bytes.
    * The deployment contract is the BATCH signature — a real codec (JNI/FFI)
    * amortizes model/codec setup across the batch; each element carries its
    * own source dims, resized to (targetW, targetH).
    */
  def decodeBatchStub(batch: Seq[(Array[Byte], Int, Int)], targetW: Int,
      targetH: Int, dim: Int): Seq[Array[Float]] =
    batch.map { case (payload, _, _) =>
      val out = new Array[Float](dim)
      var acc = 17L
      var i = 0
      while (i < payload.length) {
        acc = (acc * 31 + (payload(i) & 0xFF)) % 1000000007L
        out(i % dim) += ((acc % 1024) / 1024.0f)
        i += 1
      }
      out.map(v => v / (payload.length.max(1) / dim.toFloat))
    }

  /** Batched partition-parallel feature extraction — the `mapInPandas` shape
    * in Scala: each partition's rows are consumed as an iterator of
    * `batchSize` groups, the decoder runs once per batch (vectorized-codec
    * amortization), and results stream out without materializing the
    * partition. Output: (media_id, features ARRAY<FLOAT>).
    *
    * Scale: pure map — no shuffle; parallelism = input partitions; payload
    * bytes never hit the driver.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64, batchSize: Int = 64,
      targetW: Int = 32, targetH: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val wIdx = media.schema.fieldIndex("width")
    val hIdx = media.schema.fieldIndex("height")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map { ir =>
        (ir.getLong(idIdx), ir.getBinary(payloadIdx),
          if (ir.isNullAt(wIdx)) targetW else ir.getInt(wIdx),
          if (ir.isNullAt(hIdx)) targetH else ir.getInt(hIdx))
      }
      rows.grouped(batchSize).flatMap { batch =>
        // ONE decoder invocation per batch — the vectorized boundary
        val feats = decodeBatchStub(
          batch.map { case (_, payload, w, h) => (payload, w, h) },
          targetW, targetH, dim)
        batch.lazyZip(feats).map { case ((id, _, _, _), f) =>
          Row(id, f.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plumbing: every `stride`-th frame index per video row,
    * as (media_id, frame_idx) — a pure generator expression, no decode.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.where(col("n_frames").isNotNull && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
