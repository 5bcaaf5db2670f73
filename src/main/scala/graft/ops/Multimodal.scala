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
  * amortizes per-batch setup), resize/frame-sample parameter plumbing,
  * deterministic output schemas, and — for the image kind — an actual
  * pure-JVM PNG/BMP decode ([[imageStats]] via `javax.imageio`), verified
  * against a closed-form pixel oracle.
  *
  * The STUBBED part: learned-embedding extraction needs model weights +
  * codecs this container doesn't ship, so [[decodeBatchStub]] produces
  * deterministic fake feature vectors derived from the payload bytes. Swap
  * `decodeBatchStub` for a real JNI/FFI batch decoder at deployment;
  * nothing else changes.
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

  /** Deterministic RGB value of pixel (x, y) of synthetic image `i` — the
    * closed form both the encoder and the correctness oracle compute, so a
    * real decoder sitting between them is fully checkable.
    */
  def synthPixel(i: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((x * 31 + y * 17 + i * 13) % 256).toInt,
    ((x * 7 + y * 29 + i * 3) % 256).toInt,
    ((x * 11 + y * 5 + i * 23) % 256).toInt)

  /** Dimensions of synthetic image `i` (varied so decode can't fake them). */
  def synthDims(i: Long): (Int, Int) =
    (8 + (i % 9).toInt, 8 + (i * 7 % 9).toInt)

  /** Deterministic synthetic media table for tests and benchmarks. The
    * `image` kind carries REAL PNG payloads (encoded losslessly from
    * [[synthPixel]] via `javax.imageio`), so decode operators are exercised
    * on genuine codec bytes; other kinds carry opaque deterministic bytes.
    */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      if (kind == "image") {
        val (w, h) = synthDims(i.toLong)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val (r, g, b) = synthPixel(i.toLong, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (i.toLong, kind, bos.toByteArray, w, h, 16000, 32)
      } else {
        val payload = Array.tabulate[Byte](256)(j => ((i * 31 + j * 7) % 251).toByte)
        (i.toLong, kind, payload, 64, 48, 16000, 32)
      }
    }
    rows.toDF("media_id", "kind", "payload", "width", "height",
      "sample_rate", "n_frames")
  }

  /** REAL batch image decode (pure JVM — PNG/BMP/GIF via `javax.imageio`):
    * each payload is decoded once and summarized as
    * (width, height, per-channel pixel means). Same batch contract as
    * [[decodeBatchStub]]: one call per batch, results in input order.
    */
  def decodeImageBatch(batch: Seq[Array[Byte]]): Seq[(Int, Int, Double, Double, Double)] =
    batch.map { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      (w, h, sr / n, sg / n, sb / n)
    }

  /** Batched partition-parallel REAL image decode + per-image stats —
    * the same execution shape as [[extractFeatures]] (iterator of
    * `batchSize` groups per partition, one decoder call per batch, results
    * streamed out), but with an actual codec behind it.
    * Output: (media_id, img_w, img_h, mean_r, mean_g, mean_b).
    */
  def imageStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("img_w", IntegerType, nullable = false),
      StructField("img_h", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val stats = decodeImageBatch(batch.map(_._2))
        batch.lazyZip(stats).map { case ((id, _), (w, h, r, g, b)) =>
          Row(id, w, h, r, g, b)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
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
