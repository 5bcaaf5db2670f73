package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget bin assignment — the distributed skeleton of sequence
  * packing for LLM training: walk documents in a deterministic order,
  * accumulate token counts, and start a new bin whenever the running total
  * would cross `budget`.
  *
  * Scale design: packing is inherently sequential, so the sequence is scoped
  * to a SHARD (`shardCol`) and shards pack independently — exactly how
  * production packers parallelize (per input file / per bucket). The cumsum
  * is a windowed sum inside the shard partition: one shuffle on the shard
  * key, linear scan, no global window, no driver loop. A document longer
  * than `budget` occupies its own bin (standard overflow rule).
  *
  * The greedy "first fit in order" rule here is the deterministic,
  * oracle-checkable contract: bin boundaries depend only on (shard, order,
  * token counts), never on partitioning.
  */
object Packing {

  /** Adds `bin` (0-based within shard): the bin a document lands in when
    * documents are packed in `orderCol` order within each shard.
    *
    * A document starts a new bin when the exclusive running total of tokens
    * since the last bin break plus its own count exceeds `budget`. With the
    * simple floor(cumsum_exclusive / budget) formulation documents can
    * straddle a boundary; that is intentional — it models token-stream
    * packing (documents are concatenated and the stream is cut every
    * `budget` tokens), the common case for pretraining, and it keeps the
    * assignment a closed-form expression.
    */
  def tokenStreamBins(docs: DataFrame, shardCol: String, orderCol: String,
      tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("bin", floor(col("__cum") / budget).cast("long"))
      .drop("__cum")
  }

  /** Exclusive global prefix sum of `valueCol` in `orderCol` order, WITHOUT
    * a single-partition window: range-repartition on the order key, driver
    * prefix-sum of the ≤`buckets` per-partition totals, per-partition
    * window + baked offset (the [[Corpus.selectWithinBudget]] machinery,
    * factored for reuse). Returns (orderCol, __off). localCheckpoint, not
    * cache: the driver offsets are baked per __pid, so the window must read
    * the exact materialized partitions (see the note there).
    */
  private[ops] def prefixOffsets(df: DataFrame, orderCol: String,
      valueCol: String, buckets: Int = 64): DataFrame =
    prefixOffsetsTotal(df, orderCol, valueCol, buckets)._1

  /** [[prefixOffsets]] also returning the GLOBAL total of `valueCol` —
    * already known driver-side from the per-partition sums, so callers
    * needing the total (epoch rebasing) skip a whole extra pass+job.
    */
  private[ops] def prefixOffsetsTotal(df: DataFrame, orderCol: String,
      valueCol: String, buckets: Int = 64): (DataFrame, Long) = {
    val keyed = df
      .select(col(orderCol), col(valueCol).cast("long").as("__val"))
      .repartitionByRange(buckets, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partSums = keyed.groupBy("__pid").agg(sum(col("__val")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets).scanLeft(0L) {
      case (acc, pid) => acc + partSums.getOrElse(pid, 0L)
    }
    // offsets ride as ONE array literal (codegen references array), not a
    // per-bucket when(lit,lit) chain: the chain baked 64 per-call values
    // into the generated source, so every call compiled a brand-new
    // class (observed: whole-stage codegen off made the manifest family
    // ~40% faster — compile time, not run time). An array literal keeps
    // the generated source IDENTICAL across calls → codegen cache hit;
    // lookup is O(1) instead of a 64-branch scan per row.
    val offCol = element_at(lit(offsets.init.toArray), col("__pid") + 1)
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (keyed
      .withColumn("__off", sum(col("__val")).over(w) - col("__val") + offCol)
      .select(col(orderCol), col("__off")),
      offsets.last)
  }

  /** Fixed-length training-sequence packing over BPE token IDS — the step
    * that turns a curated corpus into the (seq, position) → token grid a
    * trainer consumes: documents are id-encoded with the learned `merges`
    * ([[Bpe]]), terminated with an EOS id (= vocabulary size), concatenated
    * in ascending doc-id order, and the token stream is cut every `seqLen`
    * tokens. Returns one summary row per packed sequence:
    * (seq_id, n_tok, n_docs, id_sum, doc_min, doc_max) — n_tok = seqLen
    * everywhere except the final partial sequence.
    *
    * Scale: encoding runs once per DISTINCT word and joins back (the
    * [[Bpe.docTokenCounts]] shape); the global token offsets come from
    * [[prefixOffsets]] (distributed prefix sum — no global window, no
    * driver data); position-within-document is a per-doc window (bounded
    * by doc length). A sequence never materializes as an array — the grid
    * stays relational (exploded) end to end, so seqLen and document size
    * never hit executor memory limits.
    */
  /** [[packTokenIds]] with the sequences MATERIALIZED: one row per packed
    * sequence carrying its token ids in position order, rendered as a
    * ':'-joined string (engine-portable — array columns don't hash-compare
    * across engines). This is the training-shard payload itself; the
    * per-sequence array is bounded by seqLen, so the collect_list is safe
    * at any corpus size.
    */
  def packTokenIdRows(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], seqLen: Int,
      byteLevel: Boolean = false, buckets: Int = 64): DataFrame =
    packedStream(docs, idCol, textCol, merges, seqLen, byteLevel, buckets)
      .groupBy(col("seq_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__p"), col("id")))),
        s => s.getField("id").cast("string")), ":").as("ids_str"),
        count(lit(1)).as("n_tok"))

  def packTokenIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], seqLen: Int,
      byteLevel: Boolean = false, buckets: Int = 64): DataFrame =
    packedStream(docs, idCol, textCol, merges, seqLen, byteLevel, buckets)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col(idCol)).as("n_docs"),
        sum(col("id")).as("id_sum"),
        min(col(idCol)).as("doc_min"),
        max(col(idCol)).as("doc_max"))

  /** ATTENTION-MASK sidecar of the packed grid: where each document
    * STARTS inside each sequence — (seq_id, idCol, start_pos, n_tok_in_seq)
    * — so a trainer can mask cross-document attention in packed batches
    * (block-diagonal mask boundaries) and weight losses per doc. A doc
    * spanning a sequence boundary contributes a row per sequence it
    * touches (start_pos 0 on the continuation). Pure projection of the
    * same token grid [[packTokenIds]] cuts — no extra encode, one
    * aggregation.
    */
  def packBoundaries(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], seqLen: Int,
      byteLevel: Boolean = false, buckets: Int = 64): DataFrame =
    packedStream(docs, idCol, textCol, merges, seqLen, byteLevel, buckets)
      .groupBy(col("seq_id"), col(idCol))
      .agg(min(col("__p")).as("start_pos"),
        count(lit(1)).as("n_tok_in_seq"))

  /** [[packBoundaries]] of the INTERLEAVED multimodal stream: a document's
    * span in a sequence covers its image tokens, text, and EOS — the mask
    * a multimodal trainer blocks cross-document attention with.
    */
  def packBoundariesInterleaved(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)], seqLen: Int,
      imgPrefix: DataFrame, byteLevel: Boolean = false,
      buckets: Int = 64): DataFrame =
    packedStream(docs, idCol, textCol, merges, seqLen, byteLevel, buckets,
        Some(imgPrefix))
      .groupBy(col("seq_id"), col(idCol))
      .agg(min(col("__p")).as("start_pos"),
        count(lit(1)).as("n_tok_in_seq"))

  /** [[packTokenIds]] with a per-doc IMAGE-token prefix interleaved into
    * the stream — the multimodal packing discipline: each document's
    * discrete image tokens (`imgPrefix`: (idCol, tpos, img_ord) — e.g. PQ
    * codes of its paired image, img_ord = subspace·k + code) ride
    * immediately BEFORE the document's text, ids offset into the image
    * region of the vocabulary (≥ EOS+1), then text, then EOS. The token
    * grid, offsets, and sequence cuts are exactly the text path's —
    * image tokens are just more tokens.
    */
  def packTokenIdsInterleaved(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)], seqLen: Int,
      imgPrefix: DataFrame, byteLevel: Boolean = false,
      buckets: Int = 64): DataFrame =
    packedStream(docs, idCol, textCol, merges, seqLen, byteLevel, buckets,
        Some(imgPrefix))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col(idCol)).as("n_docs"),
        sum(col("id")).as("id_sum"),
        min(col(idCol)).as("doc_min"),
        max(col(idCol)).as("doc_max"),
        sum(when(col("__img"), 1L).otherwise(0L)).as("n_img"))

  /** [[packTokenIdRows]] with the image-token splice — the MATERIALIZED
    * multimodal payload (seq_id, ids_str, n_tok): image token ids appear
    * in ids_str at their positions, so the persisted shard bytes carry
    * the full cross-modal stream.
    */
  def packTokenIdRowsInterleaved(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)], seqLen: Int,
      imgPrefix: DataFrame, byteLevel: Boolean = false,
      buckets: Int = 64): DataFrame =
    packedStream(docs, idCol, textCol, merges, seqLen, byteLevel, buckets,
        Some(imgPrefix))
      .groupBy(col("seq_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__p"), col("id")))),
        s => s.getField("id").cast("string")), ":").as("ids_str"),
        count(lit(1)).as("n_tok"))

  /** Deterministic per-epoch global training order — the reproducible
    * shuffle a trainer needs for exact resumption and data-order
    * debugging: epoch e's permutation ranks every item by
    * md5(key ":" epoch), so the order is a pure function of (item set,
    * epoch) — independent of layout, cluster size, and ingestion order,
    * and different every epoch.
    *
    * Scale shape: the global 0-based rank comes from [[prefixOffsets]]
    * over the composite (epoch, draw, key) sort key (distributed prefix
    * sum of 1s — range partition + driver offsets, never a global
    * window), rebased per epoch by the item count. Keys must be
    * non-negative (zero-padded decimal rendering is the tie-break).
    * Returns (epoch, keyCol, ord).
    */
  def epochOrder(items: DataFrame, keyCol: String, epochs: Int,
      buckets: Int = 64): DataFrame = {
    require(epochs >= 1, "epochs must be >= 1")
    val spark = items.sparkSession
    val es = spark.range(1, epochs + 1L)
      .select(col("id").cast("int").as("epoch"))
    // validated fixed-width key rendering: lpad TRUNCATES anything longer
    // than its width, so a negative or >20-char key would silently misorder
    // instead of erroring — raise on violation rather than diverge
    val kstr = col(keyCol).cast("string")
    val kChecked = when(kstr.startsWith("-") || length(kstr) > 20,
      raise_error(concat(
        lit(s"epochOrder: key column '$keyCol' must render non-negative " +
          "and <= 20 chars, got '"), kstr, lit("'")))).otherwise(kstr)
    val keyed = items.select(col(keyCol)).crossJoin(broadcast(es))
      .withColumn("__key", concat(
        lpad(col("epoch").cast("string"), 6, "0"), lit(":"),
        md5(concat(kstr, lit(":"), col("epoch").cast("string"))),
        lit(":"), lpad(kChecked, 20, "0")))
    // item count comes FREE from the prefix machinery's per-partition
    // totals (Σ __one = n·epochs) — the separate items.count() this used
    // to pay was a whole extra pass over the input, per call
    val (offs, total) = prefixOffsetsTotal(
      keyed.withColumn("__one", lit(1L)), "__key", "__one", buckets)
    val n = total / epochs
    keyed.join(offs, Seq("__key"))
      .select(col("epoch"), col(keyCol),
        (col("__off") - (col("epoch") - 1).cast("long") * n).as("ord"))
  }

  /** [[epochOrder]] in BATCH-MAJOR form — the APPEND-STABLE training
    * order: items rank first by their arrival batch, then by the md5 draw
    * within the batch. An already-ingested item's ord can therefore never
    * change when new data arrives (later batches only append ranks), which
    * is what lets [[graft.streaming.ShardMaintainer]] extend on-disk shard
    * files instead of rewriting the corpus — the global md5 shuffle
    * ([[epochOrder]]) reshuffles every ord retroactively on any growth.
    * Tradeoff, documented: epoch-level mixing happens within each arrival
    * batch (plus whatever shard-level sampling the data loader does), not
    * across the whole corpus; each epoch still gets a distinct
    * within-batch permutation. Returns (epoch, keyCol, ord). `batchCol`
    * must render as a non-negative integer of ≤ 6 digits (guarded, the
    * fixed-width key discipline).
    */
  def epochOrderBatchMajor(items: DataFrame, keyCol: String,
      batchCol: String, epochs: Int, buckets: Int = 64): DataFrame = {
    require(epochs >= 1, "epochs must be >= 1")
    val spark = items.sparkSession
    val es = spark.range(1, epochs + 1L)
      .select(col("id").cast("int").as("epoch"))
    def checked(c: Column, width: Int, what: String): Column = {
      val str = c.cast("string")
      when(str.startsWith("-") || length(str) > width,
        raise_error(concat(
          lit(s"epochOrderBatchMajor: $what must render non-negative " +
            s"and <= $width chars, got '"), str, lit("'")))).otherwise(str)
    }
    val kstr = col(keyCol).cast("string")
    val keyed = items.select(col(keyCol), col(batchCol))
      .crossJoin(broadcast(es))
      .withColumn("__key", concat(
        lpad(col("epoch").cast("string"), 6, "0"), lit(":"),
        lpad(checked(col(batchCol), 6, s"batch column '$batchCol'"), 6, "0"),
        lit(":"),
        md5(concat(kstr, lit(":"), col("epoch").cast("string"))),
        lit(":"),
        lpad(checked(col(keyCol), 20, s"key column '$keyCol'"), 20, "0")))
    // n from the prefix totals — the epochOrder count-elimination
    val (offs, total) = prefixOffsetsTotal(
      keyed.withColumn("__one", lit(1L)), "__key", "__one", buckets)
    val n = total / epochs
    keyed.join(offs, Seq("__key"))
      .select(col("epoch"), col(keyCol),
        (col("__off") - (col("epoch") - 1).cast("long") * n).as("ord"))
  }

  /** The per-delta increment of [[epochOrderBatchMajor]]: rank ONLY the
    * arriving batch's items (cost ∝ delta, never the corpus) and rebase
    * every epoch's ord by `baseOffset` — the count of all previously
    * ingested items. Feeding batches b₀,b₁,… through this with cumulative
    * offsets reproduces [[epochOrderBatchMajor]] over the union exactly
    * (within a batch both rank by the same (md5 draw, key) order;
    * batch-major concatenation IS the offset rebase).
    */
  def epochOrderAppended(delta: DataFrame, keyCol: String, epochs: Int,
      baseOffset: Long, buckets: Int = 64): DataFrame = {
    require(baseOffset >= 0L, "baseOffset must be >= 0")
    epochOrder(delta, keyCol, epochs, buckets)
      .withColumn("ord", col("ord") + lit(baseOffset))
  }

  /** CURRICULUM training order: epoch 1 presents items easiest-first
    * (ascending `scoreCol` — e.g. token count for length warmup, quantized
    * perplexity for difficulty warmup), epochs ≥ 2 fall back to
    * [[epochOrder]]'s md5 permutation — the standard curriculum-then-
    * shuffle schedule. Same scale shape as epochOrder: the global rank is
    * the distributed prefix sum over a composite fixed-width key, never a
    * global window. `scoreCol` and `keyCol` must render non-negative and
    * ≤ 20 chars (guarded). Returns (epoch, keyCol, ord).
    */
  def curriculumOrder(items: DataFrame, keyCol: String, scoreCol: String,
      epochs: Int, buckets: Int = 64): DataFrame = {
    require(epochs >= 1, "epochs must be >= 1")
    val spark = items.sparkSession
    val es = spark.range(1, epochs + 1L)
      .select(col("id").cast("int").as("epoch"))
    def checked(c: Column, what: String): Column = {
      val str = c.cast("string")
      when(str.startsWith("-") || length(str) > 20,
        raise_error(concat(
          lit(s"curriculumOrder: $what must render non-negative and " +
            "<= 20 chars, got '"), str, lit("'")))).otherwise(str)
    }
    val kstr = col(keyCol).cast("string")
    val keyed = items.select(col(keyCol), col(scoreCol))
      .crossJoin(broadcast(es))
      .withColumn("__key", concat(
        lpad(col("epoch").cast("string"), 6, "0"), lit(":"),
        when(col("epoch") === 1, concat(
          lpad(checked(col(scoreCol), s"score column '$scoreCol'"), 20, "0"),
          lit(":"), lpad(checked(col(keyCol), s"key column '$keyCol'"), 20, "0")))
          .otherwise(concat(
            md5(concat(kstr, lit(":"), col("epoch").cast("string"))),
            lit(":"),
            lpad(checked(col(keyCol), s"key column '$keyCol'"), 20, "0")))))
    // n from the prefix totals — the epochOrder count-elimination
    val (offs, total) = prefixOffsetsTotal(
      keyed.withColumn("__one", lit(1L)), "__key", "__one", buckets)
    val n = total / epochs
    keyed.join(offs, Seq("__key"))
      .select(col("epoch"), col(keyCol),
        (col("__off") - (col("epoch") - 1).cast("long") * n).as("ord"))
  }

  /** LENGTH-BUCKETED DYNAMIC BATCHING with padding-waste accounting — the
    * inference/SFT loader discipline for VARIABLE-length items (where the
    * fixed-grid packers above are the pretraining discipline): items land
    * in fixed-width length buckets (bucket = ⌊len/bucketWidth⌋), order
    * deterministically within their bucket by (len, key), and cut into
    * batches of `batchSize`; each batch pads to its own max length.
    * Returns one row per batch: (bucket, batch_id, n_items, pad_len,
    * actual_tok, padded_tok, waste_frac) — the padded-token waste a
    * serving fleet actually pays, as a measured, reproducible table.
    *
    * Scale shape: the within-bucket rank is the global bucket-major
    * prefix-sum rank minus the bucket's start offset — BOTH from
    * [[prefixOffsets]] (range-repartition + driver-bounded partial sums),
    * so no per-bucket single-reducer window ever forms; one aggregation
    * keyed on (bucket, batch) finishes the job. Keys are guarded
    * fixed-width renders (raise_error on negative lengths/keys, buckets
    * past 6 digits) — the epochOrder discipline.
    */
  def lengthBucketBatches(items: DataFrame, keyCol: String,
      tokensCol: String, bucketWidth: Int, batchSize: Int,
      buckets: Int = 64): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(batchSize >= 1, "batchSize must be >= 1")
    def checked(c: Column, width: Int, what: String): Column = {
      val str = c.cast("string")
      when(str.startsWith("-") || length(str) > width,
        raise_error(concat(
          lit(s"lengthBucketBatches: $what must render non-negative and " +
            s"<= $width chars, got '"), str, lit("'")))).otherwise(str)
    }
    val base = items.select(col(keyCol),
        col(tokensCol).cast("long").as("__len"))
      .withColumn("__bucket", floor(col("__len") / bucketWidth).cast("long"))
    val keyed = base.withColumn("__key", concat(
      lpad(checked(col("__bucket"), 6, "length bucket"), 6, "0"), lit(":"),
      lpad(checked(col("__len"), 20, s"tokens column '$tokensCol'"), 20, "0"),
      lit(":"),
      lpad(checked(col(keyCol), 20, s"key column '$keyCol'"), 20, "0")))
    val ranked = keyed.join(
      prefixOffsets(keyed.withColumn("__one", lit(1L)), "__key", "__one",
        buckets), Seq("__key"))
    val bucketStart = prefixOffsets(
      base.groupBy(col("__bucket")).agg(count(lit(1)).as("__n")),
      "__bucket", "__n", buckets)
      .withColumnRenamed("__off", "__bstart")
    ranked.join(bucketStart, Seq("__bucket"))
      .withColumn("__batch",
        floor((col("__off") - col("__bstart")) / batchSize).cast("long"))
      .groupBy(col("__bucket"), col("__batch"))
      .agg(count(lit(1)).as("n_items"), max(col("__len")).as("pad_len"),
        sum(col("__len")).as("actual_tok"))
      .withColumn("padded_tok", col("n_items") * col("pad_len"))
      .select(col("__bucket").as("bucket"), col("__batch").as("batch_id"),
        col("n_items"), col("pad_len"), col("actual_tok"), col("padded_tok"),
        when(col("padded_tok") === 0, lit(0.0))
          .otherwise(round(lit(1.0) - col("actual_tok") / col("padded_tok"),
            6)).as("waste_frac"))
  }

  /** The shared (seq_id, position-in-seq, token id, doc id) grid behind
    * both packing outputs.
    */
  private def packedStream(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], seqLen: Int,
      byteLevel: Boolean, buckets: Int,
      imgPrefix: Option[DataFrame] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = Bpe.vocabulary(docs, idCol, textCol, merges, byteLevel)
    val ids = vocab.toDF("token", "id")
    val eosId = vocab.map(_._2).max.toLong + 1 // vocab ids are 0..V-1; EOS = V
    val occ = Bpe.wordsPos(docs, idCol, textCol, byteLevel)
    val enc = Bpe.encodeVocab(occ.select("word").distinct(), merges, byteLevel)
      .select(col("word"), col("toks"))
    val tok = occ.join(enc, Seq("word"))
      .select(col(idCol), col("wpos"), posexplode(col("toks")))
      .withColumnRenamed("pos", "tpos")
      .withColumnRenamed("col", "token")
      .join(broadcast(ids), Seq("token"))
      .select(col(idCol), col("wpos"), col("tpos"),
        col("id").cast("long").as("id"))
    // per-doc EOS terminator rides at a position past any real word
    val withEos = tok.unionByName(docs.select(col(idCol),
      lit(Int.MaxValue).as("wpos"), lit(0).as("tpos"),
      lit(eosId).as("id")))
    // optional per-doc IMAGE-token prefix (idCol, tpos, img_ord): rides at
    // wpos = -1 — before any text word — with ids in the image region of
    // the vocabulary, EOS+1+img_ord (text 0..V-1, EOS = V, image ≥ V+1)
    val withImg = imgPrefix match {
      case Some(ip) => withEos.unionByName(ip.select(col(idCol),
        lit(-1).as("wpos"), col("tpos").cast("int").as("tpos"),
        (lit(eosId + 1L) + col("img_ord").cast("long")).as("id")))
      case None => withEos
    }
    val byDoc = Window.partitionBy(col(idCol))
      .orderBy(col("wpos"), col("tpos"))
    val seq = withImg.withColumn("__k", row_number().over(byDoc).cast("long"))
    val counts = seq.groupBy(col(idCol)).agg(max(col("__k")).as("__n"))
    val offs = prefixOffsets(counts, idCol, "__n", buckets)
    seq.join(offs, Seq(idCol))
      .withColumn("__g", col("__off") + col("__k") - 1)
      .withColumn("seq_id", floor(col("__g") / seqLen).cast("long"))
      .withColumn("__p", (col("__g") % seqLen).cast("int"))
      // __img marks spliced image-prefix rows (they ride at wpos -1) so
      // consumers can count modality mass without knowing the id layout
      .select(col("seq_id"), col("__p"), col("id"), col(idCol),
        (col("wpos") === -1).as("__img"))
  }
}
