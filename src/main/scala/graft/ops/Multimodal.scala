package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  * deterministic output schemas, and actual pure-JVM decodes for all three
  * kinds: image ([[imageStats]] via `javax.imageio` PNG/BMP), audio
  * ([[audioStats]] via a hand-rolled RIFF/WAVE PCM16 chunk walker), and
  * video ([[videoStats]] via the `javax.imageio` animated-GIF frame
  * walker — a real multi-frame container, n_frames derived from content),
  * each verified against a closed-form oracle over the synthetic payloads.
  *
  * Embedding extraction: [[imageEmbedding]] is a REAL featurizer — a
  * seeded random projection of the decoded raster (integer-exact linear
  * algebra, oracle-gated end-to-end), producing the `embedding
  * ARRAY<DOUBLE>` frame the ANN / centroid / quantization ops consume
  * directly from raw media. A LEARNED encoder still needs model weights
  * this container doesn't ship: swap [[projWeight]] for model weights (or
  * [[decodeBatchStub]] for a JNI/FFI codec+model call) at deployment;
  * the decode, batch shape, and output contract don't change.
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

  /** Closed-form 16-bit PCM sample `t` of synthetic clip `i` — like
    * [[synthPixel]], computable by both the encoder and a SQL oracle, so a
    * real WAV decoder between them is fully checkable. All intermediate
    * arithmetic is non-negative, keeping `%` semantics identical across
    * engines.
    */
  def synthSample(i: Long, t: Int): Int =
    (((t.toLong * 2957L + i * 6151L + (t.toLong * t % 97) * 131L) % 65536L)
      - 32768L).toInt

  /** (sampleRate, nSamples) of synthetic clip `i` (varied so a decoder
    * cannot fake them from the id).
    */
  def synthAudioParams(i: Long): (Int, Int) =
    (8000 + (i % 5).toInt * 2000, 200 + (i * 37 % 300).toInt)

  /** Closed-form GRAY value of pixel (x, y) in frame f of synthetic clip
    * `i`. Video frames are grayscale by construction: a gray frame has at
    * most 256 distinct colors, so the GIF palette represents it EXACTLY and
    * the closed form survives a real encode→decode round trip (an RGB
    * formula could exceed 256 colors and force lossy quantization).
    */
  def synthVideoPixel(i: Long, f: Int, x: Int, y: Int): Int =
    ((x * 31 + y * 17 + f * 41 + i * 13) % 256).toInt

  /** (width, height, nFrames) of synthetic clip `i` — all varied so a
    * decoder cannot fake them from the id.
    */
  def synthVideoParams(i: Long): (Int, Int, Int) =
    (6 + (i % 5).toInt, 6 + (i * 3 % 5).toInt, 2 + (i * 11 % 6).toInt)

  /** Identity gray palette: index v renders as RGB (v, v, v). */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** REAL animated-GIF encode of a gray frame sequence (pure JVM — the
    * `javax.imageio` sequence writer). The multi-frame container that makes
    * `kind = video` a decodable modality, not opaque bytes.
    */
  def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  private def synthVideoBytes(i: Long): Array[Byte] = {
    val (w, h, nf) = synthVideoParams(i)
    gifBytes((0 until nf).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, synthVideoPixel(i, f, x, y))
      img
    })
  }

  /** Canonical 44-byte-header RIFF/WAVE encode of mono 16-bit PCM. */
  def wavBytes(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Deterministic synthetic media table for tests and benchmarks. The
    * `image` kind carries REAL PNG payloads (encoded losslessly from
    * [[synthPixel]] via `javax.imageio`) and the `audio` kind REAL RIFF/WAVE
    * PCM16 payloads (from [[synthSample]]), so decode operators are
    * exercised on genuine codec bytes; other kinds carry opaque
    * deterministic bytes.
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
      } else if (kind == "audio") {
        val (rate, len) = synthAudioParams(i.toLong)
        val samples = Array.tabulate(len)(t => synthSample(i.toLong, t))
        (i.toLong, kind, wavBytes(rate, samples), 0, 0, rate, 0)
      } else if (kind == "video") {
        val (w, h, nf) = synthVideoParams(i.toLong)
        (i.toLong, kind, synthVideoBytes(i.toLong), w, h, 0, nf)
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

  /** REAL batch WAV decode (pure JVM — a RIFF chunk walker, no codec libs
    * needed for PCM): each payload is parsed once and summarized as
    * (sample_rate, n_samples, rms, peak), amplitudes normalized by 2¹⁵.
    * Rejects non-RIFF, non-PCM, and non-16-bit payloads. Same batch
    * contract as [[decodeImageBatch]].
    */
  /** The RIFF/WAVE PCM16 walker of [[decodeWavBatch]] returning the RAW
    * sample array — shared by segmentation, which needs per-frame access.
    * Same validation (non-PCM, corrupt chunk sizes, missing data → fail).
    */
  private[ops] def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "payload is not a RIFF/WAVE file")
    var off = 12
    var rate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = buf.getInt(off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length,
        s"corrupt RIFF chunk '$id' at $off: size $sz exceeds payload")
      if (id == "fmt ") {
        require(buf.getShort(off + 8) == 1, "not PCM")
        require(buf.getShort(off + 10) == 1, "not mono")
        require(buf.getShort(off + 22) == 16, "not 16-bit")
        rate = buf.getInt(off + 12)
      } else if (id == "data") {
        require(rate > 0, "data chunk before fmt")
        val n = sz / 2
        samples = Array.tabulate(n)(t => buf.getShort(off + 8 + t * 2))
      }
      off += 8 + sz + (sz & 1)
    }
    require(samples != null, "no data chunk")
    (rate, samples)
  }

  def decodeWavBatch(batch: Seq[Array[Byte]]): Seq[(Int, Int, Double, Double)] =
    batch.map { bytes =>
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String =
        new String(bytes, off, 4, "US-ASCII")
      require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "payload is not a RIFF/WAVE file")
      var off = 12
      var rate = -1
      var rms = 0.0; var peak = 0.0; var nSamples = -1
      while (off + 8 <= bytes.length) {
        val id = tag(off)
        val sz = buf.getInt(off + 4)
        // a corrupt/hostile chunk size must FAIL like other malformed
        // payloads, not walk the offset backwards into an infinite loop
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"corrupt RIFF chunk '$id' at $off: size $sz exceeds payload")
        if (id == "fmt ") {
          require(buf.getShort(off + 8) == 1, "not PCM")
          require(buf.getShort(off + 10) == 1, "not mono")
          require(buf.getShort(off + 22) == 16, "not 16-bit")
          rate = buf.getInt(off + 12)
        } else if (id == "data") {
          require(rate > 0, "data chunk before fmt")
          nSamples = sz / 2
          var t = 0
          var sumSq = 0.0
          while (t < nSamples) {
            val s = buf.getShort(off + 8 + t * 2) / 32768.0
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            t += 1
          }
          rms = if (nSamples > 0) math.sqrt(sumSq / nSamples) else 0.0
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
      }
      require(nSamples >= 0, "no data chunk")
      (rate, nSamples, rms, peak)
    }

  /** REAL batch image resize (decode via `javax.imageio`, then
    * nearest-neighbor resample to (tw, th)): each payload yields the
    * per-channel means of the RESIZED pixel grid. Nearest-neighbor with
    * source index floor((t·src)/target) is exact integer arithmetic, so a
    * SQL oracle can re-derive the result from the closed-form pixels —
    * unlike interpolating kernels, whose float rounding is
    * engine-specific. This is the normalize-before-featurize step of a
    * multimodal training pipeline (decodeBatchStub's resize contract, now
    * with a real codec + real resampling behind it).
    */
  def resizeImageBatch(batch: Seq[Array[Byte]], tw: Int,
      th: Int): Seq[(Int, Int, Double, Double, Double)] =
    batch.map { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) {
          val p = img.getRGB(x * w / tw, sy)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = (tw.toLong * th).toDouble
      (w, h, sr / n, sg / n, sb / n)
    }

  /** Batched partition-parallel decode + resize + stats — the
    * [[imageStats]] shape with the resample step in the walker.
    * Output: (media_id, src_w, src_h, mean_r, mean_g, mean_b) where the
    * means are over the (tw × th) RESIZED grid.
    */
  def resizeStats(media: DataFrame, tw: Int, th: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("src_w", IntegerType, nullable = false),
      StructField("src_h", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val stats = resizeImageBatch(batch.map(_._2), tw, th)
        batch.lazyZip(stats).map { case ((id, _), (w, h, r, g, b)) =>
          Row(id, w, h, r, g, b)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** dHash perceptual image hash — the standard image near-dup signature
    * (difference hash over a 9×8 nearest-neighbor grayscale grid; public
    * algorithm): bit k = 1 iff gray(x+1, y) > gray(x, y), k = y*8+x.
    * Grayscale is the integer luma 299·R + 587·G + 114·B (no division, no
    * floats), and the grid uses the same exact nearest-neighbor indexing
    * as [[resizeImageBatch]] — every step integer-exact, so a SQL oracle
    * re-derives the hash from closed-form pixels. The 64 bits return as
    * two unsigned 32-bit halves (hi = rows 4-7), because a BIGINT bit-63
    * shift overflows in the oracle engine.
    */
  def dHashBatch(batch: Seq[Array[Byte]]): Seq[(Int, Int, Long, Long)] =
    batch.map { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val g = Array.ofDim[Int](8, 9)
      var y = 0
      while (y < 8) {
        val sy = y * h / 8
        var x = 0
        while (x < 9) {
          val p = img.getRGB(x * w / 9, sy)
          g(y)(x) = ((p >> 16) & 0xFF) * 299 + (((p >> 8) & 0xFF)) * 587 +
            (p & 0xFF) * 114
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var k = 0
      y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g(y)(x + 1) > g(y)(x)) hash |= (1L << k)
          k += 1; x += 1
        }
        y += 1
      }
      (w, h, (hash >>> 32) & 0xFFFFFFFFL, hash & 0xFFFFFFFFL)
    }

  /** Batched partition-parallel dHash — the [[imageStats]] walker shape.
    * Output: (media_id, img_w, img_h, dhash_hi, dhash_lo). Image near-dup
    * detection composes downstream exactly like SimHash: hamming distance
    * = bit_count(xor) over the halves, banded for candidates at scale.
    */
  def dHashStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("img_w", IntegerType, nullable = false),
      StructField("img_h", IntegerType, nullable = false),
      StructField("dhash_hi", LongType, nullable = false),
      StructField("dhash_lo", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val stats = dHashBatch(batch.map(_._2))
        batch.lazyZip(stats).map { case ((id, _), (w, h, hi, lo)) =>
          Row(id, w, h, hi, lo)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Image near-duplicate PAIRS via banded dHash — the image face of
    * [[Dedup.simhashPairs]]: each 64-bit difference hash splits into four
    * 16-bit bands; a pair landing in the same (band index, band value)
    * bucket is a candidate, verified by exact hamming distance. The
    * banding is PIGEONHOLE-EXACT for `maxHamming` ≤ 3 (≤ 3 differing bits
    * cannot touch all four bands), so the result equals the brute-force
    * hamming filter while candidate volume stays bands × corpus — the
    * billion-image dedup shape. Hashes are computed ONCE (the decode is
    * the dominant cost) and materialized; only (id, two longs) shuffles.
    * Returns (id1, id2, hamming).
    */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val h = graft.Exec.materialize(dHashStats(media)
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo")))
    graft.Exec.releaseOnUnreachable(
      imageNearDupPairsFromHashes(h, maxHamming), h)
  }

  /** [[imageNearDupPairs]]'s banded pairing stage over an
    * already-hashed frame (media_id, dhash_hi, dhash_lo) — split out so
    * a persistent hash index ([[graft.streaming.ImageHashMaintainer]])
    * can derive the pair set without re-decoding a single image.
    */
  def imageNearDupPairsFromHashes(h: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4-band 16-bit blocking is pigeonhole-exact only to hamming 3")
    def band(c: Column, i: Int): Column =
      struct(lit(i).as("blk"),
        shiftright(c, 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    def bandLo(c: Column, i: Int): Column =
      struct(lit(i).as("blk"), c.bitwiseAND(lit(0xFFFFL)).as("v"))
    val blocks = h.select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
      explode(array(band(col("dhash_hi"), 0), bandLo(col("dhash_hi"), 1),
        band(col("dhash_lo"), 2), bandLo(col("dhash_lo"), 3))).as("b"))
    val cands = blocks.select(col("b"), col("media_id").as("id1"),
        col("dhash_hi").as("hi1"), col("dhash_lo").as("lo1"))
      .join(blocks.select(col("b"), col("media_id").as("id2"),
        col("dhash_hi").as("hi2"), col("dhash_lo").as("lo2")), Seq("b"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2", "hi1", "lo1", "hi2", "lo2").distinct()
    cands.select(col("id1"), col("id2"),
        (bit_count(col("hi1").bitwiseXOR(col("hi2"))) +
          bit_count(col("lo1").bitwiseXOR(col("lo2")))).cast("long")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Energy-based audio segmentation — the VAD-shaped curation step for
    * speech corpora: the decoded PCM stream is cut into `frameLen`-sample
    * frames, a frame is "active" when its mean square amplitude (samples
    * normalized by 2¹⁵) exceeds `threshold`, and consecutive active frames
    * merge into segments (the [[Dedup.duplicateSpans]] gaps-and-islands
    * idea on the time axis). Frame energies are sums of exact dyadic
    * rationals (int²/2³⁰, well inside double mantissa), so the activity
    * decision is bit-reproducible in SQL regardless of summation order.
    * Output: (media_id, seg_start_frame, n_frames).
    */
  def audioSegments(media: DataFrame, frameLen: Int = 50,
      threshold: Double = 0.34, batchSize: Int = 64): DataFrame = {
    require(frameLen >= 1, "frameLen must be >= 1")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("seg_start_frame", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val (_, samples) = decodeWavSamples(bytes)
          val nFrames = (samples.length + frameLen - 1) / frameLen
          val active = (0 until nFrames).map { f =>
            val from = f * frameLen
            val until = math.min(from + frameLen, samples.length)
            var e = 0.0
            var t = from
            while (t < until) {
              val s = samples(t) / 32768.0
              e += s * s
              t += 1
            }
            e / (until - from) > threshold
          }
          // islands over consecutive active frames
          val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          var f = 0
          while (f < nFrames) {
            if (active(f)) {
              val start = f
              while (f < nFrames && active(f)) f += 1
              segs += ((start, f - start))
            } else f += 1
          }
          segs.map { case (s0, n) => Row(id, s0, n) }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio FINGERPRINT over the real PCM decode — the audio face of
    * content dedup: each `frameLen`-sample frame's mean-square energy
    * quantizes to one of `levels` digits (floor(ms·levels), clamped), and
    * the digit SEQUENCE is the fingerprint. Energies are exact dyadic
    * sums (order-independent in double), so the digits — and therefore
    * fingerprint equality — are engine- and partitioning-reproducible.
    * Identical-content clips collide exactly; near-identical gain/noise
    * edits collide at coarse `levels` (the robustness knob). Downstream,
    * equality pairing is the exact-dedup shuffle shape: one key per clip.
    * Returns (media_id, fp STRING, n_frames).
    */
  def audioFingerprints(media: DataFrame, frameLen: Int = 50,
      levels: Int = 8, batchSize: Int = 64): DataFrame = {
    require(frameLen >= 1 && levels >= 2, "frameLen >= 1, levels >= 2")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", StringType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val (_, samples) = decodeWavSamples(bytes)
          val nFrames = (samples.length + frameLen - 1) / frameLen
          val sb = new java.lang.StringBuilder(nFrames)
          var f = 0
          while (f < nFrames) {
            val from = f * frameLen
            val until = math.min(from + frameLen, samples.length)
            var e = 0.0
            var t = from
            while (t < until) {
              val s = samples(t) / 32768.0
              e += s * s
              t += 1
            }
            val ms = e / (until - from)
            val d = math.min(levels - 1, math.floor(ms * levels).toInt)
            sb.append(('0' + d).toChar)
            f += 1
          }
          Row(id, sb.toString, nFrames)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio near-dup PAIRS: clips with identical fingerprints. The join is
    * an equality self-join on the fingerprint key — the exact-dedup
    * shuffle shape, not an all-pairs product. (id1, id2, fp).
    */
  def audioNearDupPairs(media: DataFrame, frameLen: Int = 50,
      levels: Int = 8): DataFrame = {
    val h = graft.Exec.materialize(audioFingerprints(media, frameLen, levels)
      .select(col("media_id"), col("fp")))
    val out = h.select(col("media_id").as("id1"), col("fp"))
      .join(h.select(col("media_id").as("id2"), col("fp")), Seq("fp"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("fp"))
    graft.Exec.releaseOnUnreachable(out, h)
  }

  /** REAL batch video decode (pure JVM — the `javax.imageio` GIF reader
    * walking every frame of the animated container): each payload yields
    * (width, height, n_frames, mean luminance over all frames, mean of the
    * LAST frame). n_frames comes from the container's frame count and the
    * last-frame mean requires decoding frame rasters individually — a fake
    * decode (or one that reads only frame 0) cannot produce them.
    */
  def decodeGifBatch(batch: Seq[Array[Byte]]): Seq[(Int, Int, Int, Double, Double)] =
    batch.map { bytes =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable image container")
      val reader = readers.next()
      reader.setInput(iis)
      try {
        val nf = reader.getNumImages(true)
        require(nf >= 1, "container holds no frames")
        var w = 0; var h = 0
        var total = 0L; var pixels = 0L; var lastSum = 0L; var lastN = 1L
        var f = 0
        while (f < nf) {
          val img = reader.read(f)
          w = img.getWidth; h = img.getHeight
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += (img.getRGB(x, y) >> 16) & 0xFF; x += 1 }
            y += 1
          }
          total += s; pixels += w.toLong * h
          if (f == nf - 1) { lastSum = s; lastN = w.toLong * h }
          f += 1
        }
        (w, h, nf, total.toDouble / pixels, lastSum.toDouble / lastN)
      } finally { reader.dispose(); iis.close() }
    }

  /** Per-frame dHash over the REAL video decode — the video near-dup
    * signature: every frame of the animated container gets the same 9×8
    * nearest-neighbor difference hash as [[dHashBatch]] (frames are
    * grayscale by construction, so the red channel IS the luma — no
    * weighting). A clip's signature is its frame-hash sequence; clip
    * near-dup pairing composes downstream by hamming distance per aligned
    * frame or set overlap, exactly like document SimHash.
    * Output: (media_id, frame_idx, dhash_hi, dhash_lo).
    */
  def videoFrameHashes(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("dhash_hi", LongType, nullable = false),
      StructField("dhash_lo", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, "payload is not a decodable image container")
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val nf = reader.getNumImages(true)
            (0 until nf).map { f =>
              val img = reader.read(f)
              val w = img.getWidth
              val h = img.getHeight
              val g = Array.ofDim[Int](8, 9)
              var y = 0
              while (y < 8) {
                val sy = y * h / 8
                var x = 0
                while (x < 9) {
                  g(y)(x) = (img.getRGB(x * w / 9, sy) >> 16) & 0xFF
                  x += 1
                }
                y += 1
              }
              var hash = 0L
              var k = 0
              y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  if (g(y)(x + 1) > g(y)(x)) hash |= (1L << k)
                  k += 1; x += 1
                }
                y += 1
              }
              Row(id, f, (hash >>> 32) & 0xFFFFFFFFL, hash & 0xFFFFFFFFL)
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL frame sampling: decode every `stride`-th frame of the animated
    * container and emit its mean luminance — the decoded counterpart of
    * the metadata-driven [[sampleFrames]] generator (which plans the
    * sampling without touching payloads; this one proves the frames).
    * Output rows: (media_id, frame_idx, mean_lum).
    */
  def sampleVideoFrames(media: DataFrame, stride: Int,
      batchSize: Int = 64): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, "payload is not a decodable image container")
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val nf = reader.getNumImages(true)
            (0 until nf by stride).map { f =>
              val img = reader.read(f)
              var s = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  s += (img.getRGB(x, y) >> 16) & 0xFF; x += 1
                }
                y += 1
              }
              Row(id, f, s.toDouble / (img.getWidth.toLong * img.getHeight))
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Scene-change keyframe selection over the REAL container decode — the
    * frame-extraction step a video training pipeline runs before
    * featurizing: frame 0 is always a keyframe (mad = 0); frame f > 0 is a
    * keyframe when its mean absolute per-pixel luminance difference vs
    * frame f−1 exceeds `threshold`. The SAD accumulates in integer space
    * (gray rasters), so `mad = sad/(w·h)` is exact and the selection is a
    * pure function of (payload, threshold) — fully closed-form-oracle-able
    * on the synthetic clips. Pure map; one sequential decode pass per
    * payload holding only two frames at a time.
    * Output: (media_id, frame_idx, mad) — keyframes only.
    */
  def keyframes(media: DataFrame, threshold: Double,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("mad", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, "payload is not a decodable image container")
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val nf = reader.getNumImages(true)
            var prev: Array[Int] = null
            (0 until nf).flatMap { f =>
              val img = reader.read(f)
              val w = img.getWidth; val h = img.getHeight
              val cur = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  cur(y * w + x) = (img.getRGB(x, y) >> 16) & 0xFF
                  x += 1
                }
                y += 1
              }
              val out =
                if (f == 0) Some(Row(id, 0, 0.0))
                else {
                  var sad = 0L
                  var i = 0
                  while (i < cur.length) {
                    sad += math.abs(cur(i) - prev(i)); i += 1
                  }
                  val mad = sad.toDouble / cur.length
                  if (mad > threshold) Some(Row(id, f, mad)) else None
                }
              prev = cur
              out
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched partition-parallel REAL video decode + per-clip stats — the
    * [[imageStats]] shape for the video kind.
    * Output: (media_id, vid_w, vid_h, n_frames, mean_lum, mean_last).
    */
  def videoStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("vid_w", IntegerType, nullable = false),
      StructField("vid_h", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false),
      StructField("mean_last", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val stats = decodeGifBatch(batch.map(_._2))
        batch.lazyZip(stats).map { case ((id, _), (w, h, nf, mean, last)) =>
          Row(id, w, h, nf, mean, last)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL batch audio resample (decode via the RIFF walker, then
    * nearest-sample resample to `tgtRate`): out length = n·tgt/src and
    * out[j] = src[(j·n)/nOut], both exact integer arithmetic — the audio
    * twin of [[resizeImageBatch]], SQL-checkable for the same reason
    * (an interpolating resampler's float kernel would not be).
    * Output per clip: (src_rate, n_src, n_out, rms of the resampled
    * signal, 2¹⁵-normalized).
    */
  def resampleAudioBatch(batch: Seq[Array[Byte]],
      tgtRate: Int): Seq[(Int, Int, Int, Double)] =
    batch.map { bytes =>
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "payload is not a RIFF/WAVE file")
      var off = 12
      var rate = -1
      var dataOff = -1; var nSrc = -1
      while (off + 8 <= bytes.length) {
        val id = tag(off)
        val sz = buf.getInt(off + 4)
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"corrupt RIFF chunk '$id' at $off: size $sz exceeds payload")
        if (id == "fmt ") {
          require(buf.getShort(off + 8) == 1 && buf.getShort(off + 10) == 1 &&
            buf.getShort(off + 22) == 16, "not mono PCM16")
          rate = buf.getInt(off + 12)
        } else if (id == "data") {
          require(rate > 0, "data chunk before fmt")
          dataOff = off + 8; nSrc = sz / 2
        }
        off += 8 + sz + (sz & 1)
      }
      require(nSrc >= 0, "no data chunk")
      val nOut = (nSrc.toLong * tgtRate / rate).toInt
      var j = 0
      var sumSq = 0.0
      while (j < nOut) {
        val srcIdx = (j.toLong * nSrc / nOut).toInt
        val s = buf.getShort(dataOff + srcIdx * 2) / 32768.0
        sumSq += s * s
        j += 1
      }
      (rate, nSrc, nOut, if (nOut > 0) math.sqrt(sumSq / nOut) else 0.0)
    }

  /** Batched partition-parallel decode + resample + stats — the
    * [[audioStats]] shape with the resample step in the walker.
    * Output: (media_id, src_rate, n_src, n_out, rms_resampled).
    */
  def resampleStats(media: DataFrame, tgtRate: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("src_rate", IntegerType, nullable = false),
      StructField("n_src", IntegerType, nullable = false),
      StructField("n_out", IntegerType, nullable = false),
      StructField("rms_resampled", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val stats = resampleAudioBatch(batch.map(_._2), tgtRate)
        batch.lazyZip(stats).map { case ((id, _), (r, ns, no, rms)) =>
          Row(id, r, ns, no, rms)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched partition-parallel REAL audio decode + per-clip stats — the
    * [[imageStats]] shape for the audio kind.
    * Output: (media_id, sample_rate, n_samples, duration_ms, rms, peak).
    */
  def audioStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("duration_ms", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("peak", DoubleType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val stats = decodeWavBatch(batch.map(_._2))
        batch.lazyZip(stats).map { case ((id, _), (rate, n, rms, peak)) =>
          Row(id, rate, n, n * 1000.0 / rate, rms, peak)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Seeded-random-projection weight for (k, x, y, c) — the closed-form
    * pseudo-random matrix the REAL featurizer projects decoded pixels
    * through. Integer arithmetic with non-negative operands, so a SQL
    * oracle reproduces it exactly: values span [-48, 48].
    */
  def projWeight(k: Int, x: Int, y: Int, c: Int, seed: Long): Long =
    ((x.toLong * 1009L + y.toLong * 2003L + c.toLong * 3001L +
      k.toLong * 4001L + seed) % 97L) - 48L

  /** REAL deterministic featurizer over the DECODED raster — closes the
    * learned-embedding stub with linear algebra instead of model weights:
    * embedding[k] = Σ_{x,y,c} pixel(x,y,c) · projWeight(k,x,y,c) /
    * (48 · w · h). The accumulation stays in INTEGER space (pixel and
    * weight are both integers), so the sum is exact and order-free — one
    * float division at the end makes the value reproducible bit-for-bit by
    * any engine, any partitioning. A real learned encoder swaps in by
    * replacing the weight function with model weights; the decode, batch
    * shape, and output contract are already what it needs.
    */
  def imageEmbeddingBatch(batch: Seq[Array[Byte]], dim: Int,
      seed: Long): Seq[Array[Double]] =
    batch.map { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val acc = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
          var k = 0
          while (k < dim) {
            acc(k) += r * projWeight(k, x, y, 0, seed) +
              g * projWeight(k, x, y, 1, seed) +
              b * projWeight(k, x, y, 2, seed)
            k += 1
          }
          x += 1
        }
        y += 1
      }
      val norm = 48.0 * w * h
      acc.map(_ / norm)
    }

  /** Batched partition-parallel REAL image embedding:
    * (media_id, embedding ARRAY<DOUBLE>) from raw payloads — the frame the
    * ANN / centroid / quantization ops consume, end-to-end from raw media.
    * Same execution shape as [[extractFeatures]]; no shuffle, no driver
    * payloads.
    */
  def imageEmbedding(media: DataFrame, dim: Int = 16, seed: Long = 42L,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      val rows = iter.map(ir => (ir.getLong(idIdx), ir.getBinary(payloadIdx)))
      rows.grouped(batchSize).flatMap { batch =>
        val embs = imageEmbeddingBatch(batch.map(_._2), dim, seed)
        batch.lazyZip(embs).map { case ((id, _), e) => Row(id, e.toSeq) }
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

  /** CLIP-style text–image PAIR construction — the contrastive-training
    * table: documents pass the quality + language gates, each kept doc is
    * deterministically assigned an image (md5-rank round-robin via
    * [[Packing.epochOrder]] — a pure function of the kept-doc set,
    * layout- and cluster-independent), and the image half carries its REAL
    * decoded embedding's norm so a broken decode or join cannot go
    * unnoticed. In a crawl pipeline the assignment comes from alignment
    * keys (page URL, alt-text anchor); the deterministic round-robin is
    * the synthetic-fixture stand-in with the same join shape.
    *
    * Scale: the text side gates map-side; the rank is the distributed
    * prefix sum (no global window); the pair join shuffles on media_id —
    * both sides can be arbitrarily large (AQE broadcasts when the media
    * side is actually small). Returns (idCol, media_id, lang, quality,
    * emb_norm).
    */
  def clipPairs(docs: DataFrame, media: DataFrame, idCol: String,
      textCol: String, minQuality: Double = 0.75, keepLang: String = "en",
      dim: Int = 16, seed: Long = 42L): DataFrame =
    clipPairsFromKept(
      gateDocs(docs, idCol, textCol, minQuality, keepLang).cache(),
      media, idCol, dim, seed)

  /** The text-side gate of [[clipPairs]], split out so a streaming
    * maintainer can persist scored survivors once per batch: one map-side
    * pass scoring quality + langid, keeping (idCol, quality, lang).
    */
  def gateDocs(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, keepLang: String): DataFrame =
    docs.select(col(idCol),
        TextOps.qualityScore(col(textCol)).as("quality"),
        TextOps.langId(col(textCol)).as("lang"))
      .where(col("quality") >= minQuality && col("lang") === keepLang)

  /** [[clipPairs]]' pair derivation over an ALREADY-GATED kept frame
    * (idCol, quality, lang) — the md5-rank assignment is a pure function
    * of the kept-doc SET, so a late-arriving doc reassigns earlier pairs
    * for free when this re-derives from accumulated state.
    */
  def clipPairsFromKept(kept: DataFrame, media: DataFrame, idCol: String,
      dim: Int = 16, seed: Long = 42L): DataFrame = {
    val nMedia = media.count()
    require(nMedia > 0, "clipPairs: media frame is empty")
    val assigned = Packing.epochOrder(kept.select(col(idCol)), idCol,
        epochs = 1)
      .select(col(idCol), (col("ord") % nMedia).as("media_id"))
    val embNorm = imageEmbedding(media, dim, seed)
      .select(col("media_id"),
        sqrt(graft.functions.VectorFns.dotNative(
          col("embedding"), col("embedding"))).as("emb_norm"))
    assigned.join(kept, Seq(idCol))
      .join(embNorm, Seq("media_id"))
      .select(col(idCol), col("media_id"), col("lang"), col("quality"),
        col("emb_norm"))
  }
}
