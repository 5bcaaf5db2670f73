package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-7 pipeline operators: exact-substring span dedup,
  * Gopher-rule quality audit, held-out perplexity filtering, SemDeDup, and
  * fixed-length token-id sequence packing. Each op gets a closed-form
  * fixture (expected output derivable by hand) plus a layout-independence
  * check where partitioning could plausibly leak into the result.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- spans

  test("duplicateSpans: shared block across docs becomes exactly one span per doc") {
    // "SHAREDBLOCK" (11 chars) embedded in different contexts; width 5 →
    // only windows fully inside the block repeat, so the merged span is
    // exactly the block: 7 windows, span_len 11.
    val docs = Seq(
      (1L, "xxxxSHAREDBLOCKqqqq"),
      (2L, "ppSHAREDBLOCKrstuvw"),
      (3L, "nothing in common here")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", width = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    got shouldBe Seq(
      (1L, 5L, 11L, 7L), // "SHAREDBLOCK" starts at pos 5 (1-based)
      (2L, 3L, 11L, 7L))
  }

  test("duplicateSpans: intra-document repetition and gap > width splits islands") {
    // "abcdefgh" occurs twice inside ONE doc, separated by > width chars:
    // two distinct spans in the same doc.
    val docs = Seq((7L, "abcdefgh0123456789abcdefgh")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", width = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    got shouldBe Seq((7L, 1L, 8L, 4L), (7L, 19L, 8L, 4L))
  }

  test("duplicateSpans: span union == brute-force duplicated-window union, any layout") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val width = 30
    val spans = Dedup.duplicateSpans(docs.repartition(13), "doc_id", "text", width)
      .as[(Long, Long, Long, Long)].collect()
    // brute force on the driver (sf0.01 is small): window text -> positions
    val all = docs.as[(Long, String)].collect()
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, t) <- all; i <- 0 to t.length - width)
      counts.updateWith(t.substring(i, i + width))(c => Some(c.getOrElse(0) + 1))
    val wantCovered = (for ((id, t) <- all; i <- 0 to t.length - width
        if counts(t.substring(i, i + width)) >= 2;
        p <- (i + 1) until (i + 1 + width)) yield (id, p)).toSet
    val gotCovered = (for ((id, s, l, _) <- spans; p <- s until (s + l))
      yield (id, p)).toSet
    gotCovered shouldBe wantCovered
    // islands are maximal: spans within a doc never overlap or touch
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._2 + a._3) // next start past end+1
        case _ =>
      }
    }
  }

  test("removeSpans cuts every duplicated span and nothing else") {
    val docs = Seq(
      (1L, "xxxxSHAREDBLOCKqqqq"),
      (2L, "ppSHAREDBLOCKrstuvw"),
      (3L, "nothing in common here"),
      (7L, "abcdefgh0123456789abcdefgh")).toDF("doc_id", "text")
    val got = Dedup.removeSpans(docs, "doc_id", "text", width = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    got shouldBe Seq(
      (1L, "xxxxqqqq", 11L),
      (2L, "pprstuvw", 11L),
      (3L, "nothing in common here", 0L),
      (7L, "0123456789", 16L))
  }

  test("removeSpans on the corpus: cut chars == duplicated-window coverage") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", 30)
      .groupBy("doc_id").agg(sum("span_len").as("cov"))
      .as[(Long, Long)].collect().toMap
    val clean = Dedup.removeSpans(docs, "doc_id", "text", 30)
      .as[(Long, String, Long)].collect()
    clean.length shouldBe docs.count()
    clean.foreach { case (id, _, cut) =>
      cut shouldBe spans.getOrElse(id, 0L)
    }
  }

  test("clusterSample: ≤ perCell rows per cell, drawn in the portable md5 order") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = Ann.ivfCentroidsFromDf(Ann.ivfTrain(emb, "embedding", nlist = 8))
    val kept = Ann.clusterSample(emb.repartition(11), "vec_id", "embedding",
      cents, perCell = 20).as[(Long, Int)].collect()
    // the kept set is the md5-order head of each cell of the assignment
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val asn = emb.select(col("vec_id"),
        graft.functions.VectorFns.nearestCellNative(
          col("embedding").cast("array<double>"), cents, 6).as("cell"))
      .as[(Long, Int)].collect()
    val want = asn.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (md5hex(r._1.toString), r._1)).take(20)
    }.sortBy(_._1)
    kept.sortBy(_._1).toSeq shouldBe want
  }

  test("leakSafeSplit: no near-dup pair straddles; singletons match the plain split") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").cache()
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5).cache()
    val split = Sampling.leakSafeSplit(docs, "doc_id", pairs, evalRate = 0.25)
      .as[(Long, Long, Boolean)].collect()
    split.length shouldBe docs.count()
    val side = split.map(r => r._1 -> r._3).toMap
    // the leakage guarantee itself
    pairs.select("id1", "id2").as[(Long, Long)].collect().foreach {
      case (a, b) => side(a) shouldBe side(b)
    }
    // docs in no component draw exactly like trainEvalSplit
    val inPairs = pairs.select("id1").as[Long].collect().toSet ++
      pairs.select("id2").as[Long].collect().toSet
    val (_, eval) = Sampling.trainEvalSplit(docs, "doc_id", 0.25)
    val plainEval = eval.select("doc_id").as[Long].collect().toSet
    split.filterNot(r => inPairs(r._1)).foreach { case (id, rep, isEval) =>
      rep shouldBe id
      isEval shouldBe plainEval(id)
    }
  }

  // --------------------------------------------------------------- gopher

  test("gopherAudit: each rule fires on its engineered document") {
    val stop26 = "the quality of this document is high because it contains " +
      "many distinct words alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " +
      "psi omega"
    val docs = Seq(
      (1L, stop26), // passes all rules
      (2L, "short text with the a of and stop words"), // < 25 words → bit 1
      (3L, ("a " * 30).trim), // mean wlen 1 → bit 2; dup → bit 16; stop → bit 8
      (4L, (1 to 30).map(i => s"$i$i").mkString(" ")) // digits → bits 4+8
    ).toDF("doc_id", "text")
    val got = TextOps.gopherAudit(docs, "doc_id", "text")
      .select("doc_id", "fail_mask").as[(Long, Long)].collect().toMap
    got(1L) shouldBe 0L
    got(2L) shouldBe 1L
    (got(3L) & 2L) shouldBe 2L
    (got(3L) & 16L) shouldBe 16L
    got(4L) shouldBe (4L | 8L) // all-numeric, no stopwords; fully distinct
  }

  test("curate: pipeline output equals the hand-staged composition") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").cache()
    val got = Corpus.curate(docs, "doc_id", "text")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    // staged by hand from the gated building blocks
    val audit = TextOps.gopherAudit(docs, "doc_id", "text", minStopwords = 1)
    val passed = docs.join(
      audit.where(col("fail_mask") === 0).select("doc_id"), Seq("doc_id"))
    val surv = passed.join(
      Dedup.exact(passed, Seq("text"), "doc_id").select("doc_id"),
      Seq("doc_id"), "semi")
    val cleaned = Dedup.removeSpans(surv, "doc_id", "text", 30)
    val scored = LangModel.perplexityScore(cleaned, "doc_id", "clean_text",
      keepBelow = 3.43)
      .where(col("kept")).select(col("id").as("doc_id"), col("avg_nll"))
    val want = cleaned.join(scored, Seq("doc_id"))
      .select(col("doc_id"),
        expr("cast(size(split(clean_text, ' ')) as long)").as("n_tok"),
        col("avg_nll"))
      .as[(Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._1))
      .scanLeft((0L, 0L, 0.0, 0L)) { case ((_, _, _, cum), (id, n, nll)) =>
        (id, n, nll, cum + n)
      }.tail.takeWhile(_._4 <= 6000L).sortBy(_._1)
    got shouldBe want
    got.length shouldBe 120 // every stage bites at sf0.01
  }

  test("curate survives a degenerate corpus (everything filtered) without error") {
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, "zz")).toDF("doc_id", "text")
    Corpus.curate(docs, "doc_id", "text").collect() shouldBe empty
  }

  // ------------------------------------------------------------ perplexity

  test("perplexityScore matches an independent driver-side reimplementation") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").limit(120).cache()
    val got = LangModel.perplexityScore(docs, "doc_id", "text", keepBelow = 3.4)
      .as[(Long, Double, Long, Boolean)].collect().sortBy(_._1)
    // independent oracle: plain Scala over collected rows
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val all = docs.as[(Long, String)].collect()
    def bigrams(t: String): Seq[(String, String)] = {
      val w = t.split(" ", -1).toSeq
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => (p(0) + " " + p(1), p(0))).toSeq
    }
    val train = all.filter { case (id, _) => md5hex(id.toString).head < '8' }
    val c2 = train.flatMap(d => bigrams(d._2)).groupBy(_._1).view
      .mapValues(_.length).toMap
    val c1 = train.flatMap(d => bigrams(d._2)).groupBy(_._2).view
      .mapValues(_.length).toMap
    val v = c1.size
    val want = all.flatMap { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) None
      else {
        val nll = -bs.map { case (bg, w1) =>
          math.log((c2.getOrElse(bg, 0) + 1).toDouble / (c1.getOrElse(w1, 0) + v))
        }.sum / bs.length
        Some((id, BigDecimal(nll).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, bs.length.toLong))
      }
    }.sortBy(_._1)
    got.map(r => (r._1, r._2, r._3)) shouldBe want
    got.foreach(r => r._4 shouldBe (r._2 <= 3.4))
  }

  test("nbQualityScore separates classes with disjoint vocabularies") {
    // positives speak "good" words, negatives "bad" words; only SOME land
    // in the md5 train half, yet every doc must classify by its vocabulary
    val good = "the data of this table is a clean and useful value " +
      "with many genuinely distinct tokens present here"          // quality ≥ 0.5
    val bad = "zz zz zz zz zz zz zz zz"   // 9 toks with suffix → quality 0.25
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) good + s" extra$i" else bad + s" odd$i")
    }.toDF("doc_id", "text")
    val got = Classify.nbQualityScore(docs, "doc_id", "text")
      .as[(Long, Double, Long, Boolean)].collect()
    got.length shouldBe 40
    got.foreach { case (id, _, _, pred) => pred shouldBe (id % 2 == 0) }
    // layout independence
    val got13 = Classify.nbQualityScore(docs.repartition(13),
      "doc_id", "text").as[(Long, Double, Long, Boolean)].collect()
    got13.sortBy(_._1) shouldBe got.sortBy(_._1)
  }

  // -------------------------------------------------------------- semdedup

  test("semDedup: within-cluster earlier near-neighbor drops, cross-cluster never") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),   // cell 0, kept (no earlier)
      (2L, Seq(0.995f, 0.1f)), // cell 0, cos(1,2) ≈ 0.995 → dropped
      (3L, Seq(0.7f, 0.3f)),   // cell 0, cos vs 1 ≈ 0.92 → dropped at τ=0.9
      (4L, Seq(0.0f, 1.0f)),   // cell 1, kept — v2/v3 are other-cluster
      (5L, Seq(0.6f, 0.8f))    // cell 1, cos(4,5) = 0.8 < 0.9 → kept
    ).toDF("vec_id", "embedding")
    val got = Ann.semDedup(vecs, "vec_id", "embedding", cents, tau = 0.9)
      .as[(Long, Int)].collect().sortBy(_._1)
    got shouldBe Seq((1L, 0), (4L, 1), (5L, 1))
  }

  test("semDedup is layout-independent on the real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = Ann.ivfCentroidsFromDf(Ann.ivfTrain(emb, "embedding", nlist = 8))
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.semDedup(df, "vec_id", "embedding", cents, tau = 0.3)
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
    run(emb.repartition(17)) shouldBe run(emb.coalesce(1))
  }

  test("decontaminate: a copied eval passage drops the corpus doc, clean docs keep") {
    val evalDocs = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix words the quick brown fox jumps over the lazy dog today"),
      (11L, "completely different content with no overlapping grams at all here")
    ).toDF("doc_id", "text")
    val got = Corpus.decontaminate(corpus, evalDocs, "doc_id", "text",
      n = 5, maxOverlapFrac = 0.1)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    got(10L) shouldBe false
    got(11L) shouldBe true
  }

  // ------------------------------------------------------------ multimodal

  test("dHash: duplicate payloads hash identically; a small edit stays hamming-near") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = png(32, 32, (x, y) => ((x * 8) << 16) | ((y * 8) << 8) | 64)
    val dup = png(32, 32, (x, y) => ((x * 8) << 16) | ((y * 8) << 8) | 64)
    val edit = png(32, 32, (x, y) =>
      if (x == 5 && y == 5) 0xFFFFFF
      else ((x * 8) << 16) | ((y * 8) << 8) | 64)
    val Seq(hb, hd, he) = Multimodal.dHashBatch(Seq(base, dup, edit))
    hb shouldBe hd
    def hamming(a: (Int, Int, Long, Long), b: (Int, Int, Long, Long)): Int =
      java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    hamming(hb, he) should be <= 4
  }

  test("imageNearDupPairs: banded candidates == brute-force hamming filter; dup and 1-pixel edit both pair") {
    def png(seed: Int, edit: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y,
          if (edit && x == 5 && y == 5) 0xFFFFFF
          else (((x * 8 + seed) % 256) << 16) | ((y * 8) << 8) | 64)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    import spark.implicits._
    // 1&2 byte-identical, 3 a 1-pixel edit of 1, 4..9 unrelated gradients
    val media = (Seq((1L, png(0)), (2L, png(0)), (3L, png(0, edit = true))) ++
      (4L to 9L).map(i => (i, png(i.toInt * 37)))).toDF("media_id", "payload")
    val banded = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the same hashes
    val hs = Multimodal.dHashStats(media)
      .select("media_id", "dhash_hi", "dhash_lo")
      .as[(Long, Long, Long)].collect()
    val brute = (for {
      a <- hs; b <- hs if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (a._1, b._1, h.toLong)).toSet
    banded shouldBe brute
    banded.map(p => (p._1, p._2)) should contain (1L -> 2L) // exact dup
    assert(banded.exists(p => (p._1, p._2) == (1L, 3L) ||
      (p._1, p._2) == (2L, 3L))) // the 1-pixel edit stays within hamming 3
  }

  test("audioSegments: closed-form loud/quiet/loud WAV splits into two segments") {
    val loud = Array.fill(100)(29000)   // ms ≈ 0.78 > 0.34
    val quiet = Array.fill(50)(0)
    val samples = loud ++ quiet ++ loud.take(50)
    val wav = Multimodal.wavBytes(8000, samples)
    val media = Seq((1L, wav)).toDF("media_id", "payload")
    val got = Multimodal.audioSegments(media)
      .as[(Long, Int, Int)].collect().sortBy(_._2)
    got shouldBe Seq((1L, 0, 2), (1L, 3, 1))
  }

  test("audioFingerprints: clones collide; a small gain edit collides coarse but not fine") {
    val base = Array.tabulate(200)(t => (math.sin(t * 0.3) * 20000).toInt)
    val gained = base.map(s => (s * 1.1).toInt) // +10% gain
    // loud enough that its frame energies land in a different coarse
    // bucket than base's (~0.45 vs ~0.19 mean square)
    val other = Array.tabulate(200)(t => (math.cos(t * 0.7) * 31000).toInt)
    val media = Seq(
      (1L, Multimodal.wavBytes(8000, base)),
      (2L, Multimodal.wavBytes(8000, base)),   // byte-identical clone
      (3L, Multimodal.wavBytes(8000, gained)),
      (4L, Multimodal.wavBytes(8000, other))).toDF("media_id", "payload")
    def pairs(levels: Int): Set[(Long, Long)] =
      Multimodal.audioNearDupPairs(media, levels = levels)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    val coarse = pairs(4)
    coarse should contain ((1L, 2L))
    coarse should contain ((1L, 3L)) // gain edit collides at 4 levels (ms 0.19 -> 0.23, same bucket)
    coarse should not contain ((1L, 4L))
    // at a fine quantization the gain edit separates, the clone never does
    val fine = pairs(64)
    fine should contain ((1L, 2L))
    fine should not contain ((1L, 3L))
  }

  test("extractHtmlText: scripts/styles vanish, tags strip, entities decode") {
    val html = Seq((1L,
      """<html><head><style>p{x}</style><script>alert("hi")</script></head>""" +
        """<body><h1>Title</h1><p>a &amp; b &lt;c&gt; &quot;d&quot;""" +
        """ &#39;e&#39;&nbsp;f</p></body></html>""")).toDF("doc_id", "html")
    val got = html.select(TextOps.extractHtmlText(col("html")).as("t"))
      .as[String].head()
    got shouldBe """Title a & b <c> "d" 'e' f"""
  }

  test("new decode paths reject corrupt payloads like the existing ones") {
    val junk = Array.tabulate[Byte](64)(_.toByte)
    intercept[Exception] { Multimodal.dHashBatch(Seq(junk)).head }
    intercept[Exception] {
      val media = Seq((1L, junk)).toDF("media_id", "payload")
      Multimodal.audioSegments(media).collect()
    }
    intercept[Exception] {
      val media = Seq((1L, junk)).toDF("media_id", "payload")
      Multimodal.videoFrameHashes(media).collect()
    }
  }

  // ------------------------------------------------------------ edge cases

  test("duplicateSpans/removeSpans edges: short docs, exact-width docs, total duplication") {
    val docs = Seq(
      (1L, "tiny"),                 // shorter than width: never windows
      (2L, "exactlyfivewidthblock"),// no duplicate anywhere
      (3L, "AAAAABBBBB"),           // whole text duplicated with doc 4
      (4L, "AAAAABBBBB"),
      (5L, "")                      // empty text
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", width = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // docs 3 and 4: every window duplicated → ONE span covering everything
    spans shouldBe Seq((3L, 1L, 10L, 6L), (4L, 1L, 10L, 6L))
    val clean = Dedup.removeSpans(docs, "doc_id", "text", width = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    clean shouldBe Seq(
      (1L, "tiny", 0L), (2L, "exactlyfivewidthblock", 0L),
      (3L, "", 10L), (4L, "", 10L), (5L, "", 0L))
  }

  test("packTokenIds edges: wordless docs still emit EOS; seqLen 1 = one token per seq") {
    // doc 2 has no [a-z0-9] words at all — its EOS must still be packed
    val docs = Seq((1L, "ab"), (2L, "!!! ???")).toDF("doc_id", "text")
    val got = Packing.packTokenIds(docs, "doc_id", "text",
      merges = Seq(("a", "b")), seqLen = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // vocab a=0 b=1 ab=2, EOS=3; stream = [2(d1), 3(d1), 3(d2)]
    got shouldBe Seq(
      (0L, 1L, 1L, 2L, 1L, 1L),
      (1L, 1L, 1L, 3L, 1L, 1L),
      (2L, 1L, 1L, 3L, 2L, 2L))
  }

  test("perplexityScore edge: single-word docs produce no score row") {
    val docs = Seq((1L, "hello"), (2L, "hello world again"),
      (3L, "hello world")).toDF("doc_id", "text")
    val got = LangModel.perplexityScore(docs, "doc_id", "text")
      .select("id").as[Long].collect().sorted
    got shouldBe Seq(2L, 3L)
  }

  test("prefixOffsets == driver-computed exclusive prefix sum, seeded random inputs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 200L).map(i => (i, rnd.nextInt(50).toLong))
      // exclusive prefix in id order, computed on the driver
      var acc = 0L
      val expect = rows.sortBy(_._1).map { case (id, n) =>
        val o = acc; acc += n; (id, o)
      }.toMap
      val got = Packing.prefixOffsets(
        rows.toDF("id", "n").repartition(7), "id", "n", buckets = 16)
        .as[(Long, Long)].collect().toMap
      got shouldBe expect
    }
  }

  // --------------------------------------------------------------- packing

  test("packTokenIds: closed-form merge/pack on a two-doc fixture") {
    // merges [(a,b)] → vocab a=0 b=1 c=2 d=3 ab=4, EOS=5.
    // doc1 "ab ab" → [4,4,5]; doc2 "ab cd" → [4,2,3,5].
    // stream [4,4,5,4,2,3,5]; seqLen 3 → seqs [4,4,5] [4,2,3] [5].
    val docs = Seq((1L, "ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val got = Packing.packTokenIds(docs, "doc_id", "text",
      merges = Seq(("a", "b")), seqLen = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe Seq(
      (0L, 3L, 1L, 13L, 1L, 1L),
      (1L, 3L, 1L, 9L, 2L, 2L),
      (2L, 1L, 1L, 5L, 2L, 2L))
  }

  test("packTokenIds: full sequences except the last; layout-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10)
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packTokenIds(df, "doc_id", "text", merges, seqLen = 128)
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(docs.repartition(13))
    a shouldBe run(docs.coalesce(1))
    // every sequence but the last is exactly full, and seq ids are dense
    a.map(_._1) shouldBe a.indices.map(_.toLong)
    a.init.foreach(_._2 shouldBe 128L)
    assert(a.last._2 >= 1L && a.last._2 <= 128L)
    // the stream is in ascending doc order: per-sequence doc ranges are
    // monotone and consecutive sequences share at most a boundary doc
    a.sliding(2).foreach {
      case Seq(x, y) =>
        assert(x._5 <= x._6); assert(y._5 >= x._6)
      case _ =>
    }
  }
}
