package graft

import graft.SparkSpec
import graft.ops.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Physical-plan regression gates: the properties that make these operators
  * scale (pushdown, pruning, join strategy, shuffle count) asserted on the
  * pre-adaptive plan so a refactor that silently loses them fails CI, not a
  * 100 TB run.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // the post-EnsureRequirements plan (exchanges inserted), unwrapped from AQE
  private def plan(df: DataFrame): SparkPlan =
    graft.sources.Bucketing.concretePlan(df)

  test("q1_agg: shipdate filter is pushed to the scan; projection is pruned") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, sf)).toString
    p should include("PushedFilters")
    p should include("l_shipdate")
    // q1 reads 7 of lineitem's 11 columns; the scan schema must not carry
    // the unused ones
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    readSchema should include("l_returnflag")
    readSchema should not include "l_partkey"
    readSchema should not include "l_tax"
  }

  test("asofJoin: two shuffles (right dedup + sweep), never a fan-out join") {
    val ev = Tables.read(spark, sf, "events")
    val df = Joins.asofJoin(
      ev.where(col("event_type") === "view").select("user_id", "ts", "event_id"),
      ev.where(col("event_type") === "click").select("user_id", "ts", "event_id", "value"),
      on = "ts", by = "user_id", valueCols = Seq("value"), tieBreak = "event_id")
    val p = plan(df)
    p.collect { case s: ShuffleExchangeLike => s }.size shouldBe 2
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("rangeJoinBinned: equi-join on the bin key, no nested-loop join") {
    val orders = Tables.read(spark, sf, "orders")
    val iv = orders.groupBy(col("o_custkey").as("cust"))
      .agg((max(col("o_totalprice")) * 0.99).as("lo"),
        (max(col("o_totalprice")) * 1.01).as("hi"))
    val pts = orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
    val p = plan(Joins.rangeJoinBinned(pts, iv, "price", "lo", "hi", 10000.0))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("date-partitioned events: day filter prunes partitions at the scan") {
    import graft.sources.EventSources
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.read(spark, sf, "events")
    EventSources.writePartitionedByDay(events, s"$dir/events_by_day")
    val back = spark.read.parquet(s"$dir/events_by_day")
    val oneDay = back.where(col("day") === "2024-01-02")
    val p = plan(oneDay).toString
    p should include("PartitionFilters")
    p.linesIterator.find(_.contains("PartitionFilters")).get should
      include("day")
    // pruned read returns exactly that day's rows, and the day derivation
    // partitions the full table without loss
    back.count() shouldBe events.count()
    oneDay.count() shouldBe events
      .where(expr("to_date(timestamp_micros(ts DIV 1000)) = '2024-01-02'")).count()
  }

  test("dedup family plans carry no cartesian products") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions.col
    val docs = Tables.read(spark, sf, "documents")
    val index = Dedup.minhashSignatures(
      docs.where(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("id"),
          graft.functions.TextFns.wordShinglesNative(col("text"), 3).as("grams")),
      "id", "grams", 64)
    for (df <- Seq(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5),
        Dedup.minhashLshPairs(docs, "doc_id", "text"),
        Dedup.simhashPairs(docs, "doc_id", "text"),
        Dedup.incrementalLshPairs(docs, "doc_id", "text", index,
          docs.where(col("doc_id") % 3 === 0).select(col("doc_id"))))) {
      plan(df).collect { case c: CartesianProductExec => c } shouldBe empty
    }
  }

  test("stratified hash sample: pure map-side filter, zero exchanges") {
    import graft.ops.Sampling
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(Sampling.stratifiedHashSample(docs, "lang", "doc_id",
      Map("en" -> 0.1), 0.5))
    p.collect { case s: ShuffleExchangeLike => s } shouldBe empty
  }

  test("bloom semi join: might_contain predicate sits below the semi join") {
    import graft.ops.Joins
    val li = Tables.read(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")
    val hi = Tables.read(spark, sf, "orders")
      .where(col("o_totalprice") > 400000.0).select("o_orderkey")
    val df = Joins.bloomSemiJoin(li, hi, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, fpp = 0.05)
    val p = plan(df)
    // the bloom predicate must appear in a Filter, not be lost to the join
    p.toString should include("might_contain")
    // and the big side's filter runs before any exchange feeding the join:
    // every shuffle in the plan sees only bloom-filtered (or small-side) rows
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    joins should not be empty
    joins.head.left.toString should include("might_contain")
  }

  test("heavy hitters: sketch screen filters BELOW the aggregation exchange") {
    // parquet-backed input: a LocalRelation would let Catalyst constant-fold
    // the screen at optimize time and hide it from the plan
    val rows = Tables.read(spark, sf, "documents").select(col("lang").as("k"))
    val p = plan(graft.ops.Sketch.heavyHitters(rows, "k", minCount = 3))
    // one exchange for the final per-key count — the screened candidates —
    // and the codegen'd sketch-probe filter must sit under it (map-side),
    // not above; no per-row UDF anywhere in the screen
    val shuffles = p.collect { case s: ShuffleExchangeLike => s }
    shuffles.size shouldBe 1
    shuffles.head.child.toString should include("graft_cms_estimate")
    (shuffles.head.child.toString should not).include("UDF")
  }

  test("zorder box query: both range predicates are pushed to the scan") {
    val base = java.nio.file.Files.createTempDirectory("graft_planz").toString
    val data = (1 to 5000).map(i => (i.toLong, (i % 97).toLong, (i % 89).toLong))
      .toDF("id", "x", "y")
    graft.sources.Layout.zorderWrite(data, Seq("x", "y"), s"$base/t", files = 4)
    val p = plan(spark.read.parquet(s"$base/t")
      .where(col("x") <= 10L && col("y") <= 10L).select("id")).toString
    p should include("PushedFilters")
    p should include("LessThanOrEqual(x,10)")
    p should include("LessThanOrEqual(y,10)")
    graft.Exec.deletePath(base)
  }

  test("contamination pairs: eval n-gram side is broadcast, corpus side is not shuffled for the join") {
    import graft.ops.Corpus
    val docs = Tables.read(spark, sf, "documents")
    val df = Corpus.contaminationPairs(
      docs.where(col("doc_id") >= 25), docs.where(col("doc_id") < 25),
      "doc_id", "text", n = 5)
    val p = plan(df)
    p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    } should not be empty
    // shuffles: corpus widen repartition + final pair aggregation only —
    // the gram join itself must not shuffle the exploded corpus grams
    p.collect { case s: ShuffleExchangeLike => s }.size should be <= 2
  }

  test("boilerplate fraction: boiler-gram set is broadcast back to the gram stream") {
    import graft.ops.Corpus
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(Corpus.boilerplateFraction(docs, "doc_id", "text"))
    // the df>=minDocs gram set joins back via broadcast, not a gram shuffle
    p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    } should not be empty
  }

  test("media featurizer: pure map — zero exchanges, payloads never shuffle") {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticMedia(spark, 20)
    val p = plan(Multimodal.imageEmbedding(media, dim = 8))
    p.collect { case s: ShuffleExchangeLike => s } shouldBe empty
    p.collect { case c: CartesianProductExec => c } shouldBe empty
  }

  test("byte-BPE doc token counts: occurrence→vocab join needs no cartesian and at most the key shuffles") {
    import graft.ops.Bpe
    val docs = Tables.read(spark, sf, "documents")
    val merges = Seq(("74", "68"), ("7468", "65"))
    val p = plan(Bpe.docTokenCounts(docs, "doc_id", "text", merges,
      byteLevel = true))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
    // word shuffle (occ⋈enc), per-doc aggregation, doc-id left join — the
    // distinct on the vocab side reuses the word shuffle's partitioning
    p.collect { case s: ShuffleExchangeLike => s }.size should be <= 5
  }

  test("gopherAudit: pure map — zero exchanges") {
    import graft.ops.TextOps
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(TextOps.gopherAudit(docs, "doc_id", "text"))
    p.collect { case s: ShuffleExchangeLike => s } shouldBe empty
  }

  test("duplicateSpans: digest-keyed equi plan, document text never joins") {
    import graft.ops.Dedup
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(Dedup.duplicateSpans(docs, "doc_id", "text", width = 30))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
    // widen repartition, digest shuffle for the count + join-back, doc-id
    // window, final island aggregation reusing the window's partitioning
    p.collect { case s: ShuffleExchangeLike => s }.size should be <= 5
  }

  test("semDedup: within-cell equi-join, never an all-pairs product") {
    import graft.ops.Ann
    val emb = Tables.read(spark, sf, "embeddings")
    val cents = Array(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val p = plan(Ann.semDedup(emb, "vec_id", "embedding", cents, tau = 0.3))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("packTokenIds: equi-joins only; vocab ids ride a broadcast") {
    import graft.ops.{Bpe, Packing}
    val docs = Tables.read(spark, sf, "documents")
    val merges = Seq(("t", "h"), ("th", "e"))
    val p = plan(Packing.packTokenIds(docs, "doc_id", "text", merges,
      seqLen = 128))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
    p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    } should not be empty
  }

  test("perplexityScore: model joins are equi; only the 1-row V scalar nest-loops") {
    import graft.ops.LangModel
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(LangModel.perplexityScore(docs, "doc_id", "text"))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    // the add-one denominator joins a ONE-ROW aggregate — the only
    // (intentional, bounded) nested-loop in the plan
    p.collect { case b: BroadcastNestedLoopJoinExec => b }.size should be <= 1
  }

  test("nbQualityScore: equi model joins; only the two 1-row scalars nest-loop") {
    import graft.ops.Classify
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(Classify.nbQualityScore(docs, "doc_id", "text"))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b }.size should be <= 2
  }

  test("leakSafeSplit: component join-back is equi, never a product") {
    import graft.ops.{Dedup, Sampling}
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(Sampling.leakSafeSplit(docs, "doc_id",
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5),
      evalRate = 0.25))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("lshMultiProbePairs: candidate join is equi on (tbl, bucket), never a product") {
    import graft.ops.Ann
    val emb = Tables.read(spark, sf, "embeddings")
    val planes = Ann.lshPlanesFromDf(
      Ann.lshPlanesDf(spark, nTables = 2, bitsPerTable = 4, dim = 64))
    val p = plan(Ann.lshMultiProbePairs(emb, "vec_id", "embedding", 0.9, planes))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("semDedupPq: the within-cell screen join carries codes, never the vectors") {
    import graft.ops.Ann
    val emb = Tables.read(spark, sf, "embeddings")
    val cents = Array(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val cb = Array.fill(8)(Array.tabulate(4)(i =>
      Array.fill(8)(0.05 * (i + 1))))
    val df = Ann.semDedupPq(emb, "vec_id", "embedding", cents, cb, tau = 0.3)
    val p = plan(df)
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
    // the cell-keyed pair join must project to (cell, id, codes, |x̂|) on
    // both sides — the embedding column must NOT be among its join inputs
    val pairJoin = p.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if j.leftKeys.exists(_.toString.contains("cell")) ||
           j.output.exists(_.name == "__c1") => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.output.exists(_.name == "__c1") => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.output.exists(_.name == "__c1") => j
    }
    pairJoin should not be empty
    pairJoin.foreach { j =>
      j.output.map(_.name) should not contain "__v1"
      j.output.map(_.name) should not contain "__v2"
    }
  }

  test("ivfPqTopK: ADC join is equi on the probed cell; exact pass only semi-joins the shortlist") {
    import graft.ops.Ann
    val emb = Tables.read(spark, sf, "embeddings")
    val cents = Array(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val cb = Array.fill(8)(Array.tabulate(4)(i =>
      Array.fill(8)(0.05 * (i + 1))))
    val p = plan(Ann.ivfPqTopK(emb, emb.where(col("vec_id") < 2),
      "vec_id", "embedding", k = 5, cents, cb, nprobe = 1))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("epochOrder: no single-partition exchange — the global rank is the distributed prefix sum") {
    import graft.ops.Packing
    val docs = Tables.read(spark, sf, "documents")
    val p = plan(Packing.epochOrder(docs.select("doc_id"), "doc_id", 2))
    p.collect {
      case s: ShuffleExchangeLike
        if s.outputPartitioning.numPartitions == 1 => s
    } shouldBe empty
  }

  test("knnGraph: unhinted equi-join on the cell key — no forced broadcast, no product") {
    import graft.ops.Ann
    val emb = Tables.read(spark, sf, "embeddings")
    val cents = Array(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val p = plan(Ann.knnGraph(emb, "vec_id", "embedding", k = 3, cents,
      nprobe = 2))
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
    // the logical join must NOT carry a broadcast hint: the "query" side is
    // the corpus itself, so the strategy has to stay size-based (AQE may
    // still broadcast at spec scale — the HINT is what can't scale)
    val lp = Ann.knnGraph(emb, "vec_id", "embedding", k = 3, cents,
      nprobe = 2).queryExecution.analyzed
    lp.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    } shouldBe empty
  }

  test("hardNegativesGraph: the same cell-keyed shape — no product, no broadcast hint") {
    import graft.ops.Ann
    val emb = Tables.read(spark, sf, "embeddings")
    val cents = Array(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val df = Ann.hardNegativesGraph(emb, "vec_id", "embedding", "label",
      k = 3, cents, nprobe = 2)
    val p = plan(df)
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    p.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    } shouldBe empty
  }

  test("clipPairs: no single-partition exchange — the rank is the prefix sum, not a global window") {
    val docs = Tables.read(spark, sf, "documents")
    val media = graft.ops.Multimodal.syntheticMedia(spark, 8)
    val p = plan(graft.ops.Multimodal.clipPairs(docs, media, "doc_id",
      "text", minQuality = 0.0, keepLang = "en", dim = 8))
    p.collect {
      case s: ShuffleExchangeLike
        if s.outputPartitioning.numPartitions == 1 => s
    } shouldBe empty
  }

  test("p_curation_report: reads the memoized curate checkpoint, never re-runs the pipeline") {
    // the 3.2↔8.7 s bench bimodality was this gate re-running curate
    // whenever the shared CacheManager entry had been GC-released; the fix
    // pins it to the localCheckpoint memo, so the plan must scan
    // checkpointed rows (RDDScan) and contain NONE of the curate stages
    // (no window-digest explode, no LM scoring aggregate on bigrams)
    val p = plan(SparkEntry.queries("p_curation_report")(spark, sf)).toString
    p should include("Scan ExistingRDD")
    p should not include "bigram"
    p should not include "fail_mask"
  }

  test("AnnIndexMaintainer.searchAsOf: cell pruning stays a partition filter; batch_id is a pushed data filter") {
    import graft.streaming.AnnIndexMaintainer
    val dir = java.nio.file.Files.createTempDirectory("asofplan").toString
    val vecs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.9, 0.1))).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    AnnIndexMaintainer.processBatch(vecs, 0L, "vec_id", "embedding", cents,
      dir)
    AnnIndexMaintainer.processBatch(vecs.limit(0), 1L, "vec_id",
      "embedding", cents, dir)
    val p = plan(AnnIndexMaintainer.searchAsOf(spark, dir, cents,
      Seq((9L, Array(1.0, 0.0))), k = 2, asOf = 0L, nprobe = 1)).toString
    // the probe-cell predicate must land on the `cell=` DIRECTORY column
    // (directories never opened), the version predicate on the data rows
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    pf should include("cell")
    p.linesIterator.find(_.contains("PushedFilters")).getOrElse("") should
      include("batch_id")
  }

  test("search over a GROWN index: cell pruning lands in EVERY union " +
      "branch (batch dirs and growth dirs) and the move exclusion is a " +
      "broadcast anti-join, never a shuffle") {
    import graft.streaming.AnnIndexMaintainer
    val dir = java.nio.file.Files.createTempDirectory("growplan").toString
    val w0 = (0L to 9L).map(i => (i, Seq(
      (if (i % 2 == 0) 1.0 else 0.0) + 0.01 * i,
      if (i % 2 == 0) 0.0 else 1.0))).toDF("vec_id", "embedding")
    val w1 = (10L to 19L).map(i => (i, Seq(5.0 + 0.01 * i, 5.0)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    AnnIndexMaintainer.processBatchMonitored(w0, 0L, "vec_id", "embedding",
      cents, dir)
    AnnIndexMaintainer.markTrained(dir, 0L)
    AnnIndexMaintainer.processBatchMonitored(w1, 1L, "vec_id", "embedding",
      cents, dir)
    val cents1 = graft.ops.Ann.ivfCentroidsFromDf(
      AnnIndexMaintainer.grow(spark, dir, cents, kNew = 2))
    val p = plan(AnnIndexMaintainer.search(spark, dir, cents1,
      Seq((100L, Array(5.1, 5.0))), k = 2, nprobe = 1)).toString
    // every file-scan branch of the union (b0, b1, g2/data) keeps the
    // probe-cell predicate on the DIRECTORY column — a branch that scans
    // all cells at 100 TB reads nlist× more than it should
    val pfs = p.linesIterator.filter(_.contains("PartitionFilters"))
      .filterNot(_.contains("PartitionFilters: []")).toSeq
    pfs.size should be >= 3
    all(pfs) should include("cell")
    // the movers-sized exclusion must broadcast, never shuffle the corpus
    p should include("BroadcastHashJoin")
    p.toLowerCase should include("leftanti")
    p should not include "SortMergeJoin"
  }
}
