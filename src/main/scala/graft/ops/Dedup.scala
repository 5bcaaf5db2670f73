package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash. Embedding-cosine near-dup lives in
  * [[Ann.cosinePairs]].
  *
  * Scale design:
  *   - exact dedup = one hash-shuffle on the key (map-side partial agg).
  *   - Jaccard pairs = explode shingles → shuffle on shingle → pair counts.
  *     Hot shingles are quadratic (a shingle shared by f docs emits f²/2
  *     pairs); `maxShingleDocs` drops shingles above a document-frequency
  *     ceiling — the standard web-dedup mitigation — at a small recall cost.
  *     [[jaccardPairsPrefix]] keeps EXACT results while pruning: only the
  *     rarest (1−t) fraction of each doc's shingles enter the self-join
  *     (prefix-filter theorem), so the hot-shingle blow-up collapses
  *     without losing a single pair.
  *   - MinHash+LSH replaces the all-pairs comparison with a band-bucket join:
  *     cost is (#docs × #bands) rows, independent of pair count, then exact
  *     verification only on candidates. This is THE 100 TB path.
  *   - SimHash: 63-bit signature; candidates via 16-bit block match
  *     (guaranteed complete for hamming ≤ 3), verified by bit_count(xor).
  *
  * All signatures are native Catalyst expressions (murmur3 `hash`, higher-
  * order array functions) — no UDFs, no driver loops.
  */
object Dedup {

  /** Heavy per-document compute (shingling, minhashing, signature builds)
    * must not inherit the scan's partition count: a compressed text corpus
    * often arrives as fewer splits than cores (one, at bench scale), which
    * serializes the whole pre-shuffle map stage. When the input has fewer
    * partitions than the cluster's parallelism, hash-repartition on the doc
    * id (hash, not round-robin — round-robin inserts a full-row local sort
    * for deterministic retries). No-op at real scale, where splits ≫ cores.
    */
  private[ops] def widen(df: DataFrame, byCol: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(byCol))
    else df
  }

  /** Exact dedup: one representative (min id) + multiplicity per key group.
    * Grouping by the raw key shuffles the full key bytes — fine for bounded
    * keys; for document-scale text use [[exactByHash]].
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Exact dedup at corpus scale: shuffle a 128-bit content key
    * (xxhash64 ⊕ length-salted xxhash64) instead of the full text — the
    * shuffle carries 16 bytes per row regardless of document size. Collision
    * probability across 2⁶⁴·2⁶⁴ key space is negligible for any real corpus
    * (~n²/2¹²⁸ birthday bound).
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      xxhash64(col(textCol)).as("__h1"),
      xxhash64(length(col(textCol)), col(textCol)).as("__h2"))
      .groupBy("__h1", "__h2")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Exact-substring (cross-document span) dedup — the ExactSubstr
    * deduplication of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), re-expressed for Spark: instead of a
    * distributed suffix array, slide a stride-1 character window of
    * `width` over every document and keep the positions whose window text
    * occurs ≥ 2 times in the corpus (any second occurrence — cross- or
    * intra-document). The union of surviving windows, merged into maximal
    * islands per document, is EXACTLY the union of all duplicated
    * substrings of length ≥ `width` — the same removal set the suffix
    * array yields at resolution `width`.
    *
    * Returns one row per merged span: (idCol, span_start, span_len,
    * n_windows), 1-based character positions.
    *
    * Scale: the window stream is O(total corpus chars) rows but each
    * carries only (id, pos, 16-byte md5 digest) — the shuffle is bounded
    * per input byte and never moves document text. The duplicate-key
    * filter is one map-side-combinable count; island merging shuffles
    * once on the doc id and windows per-document (bounded by doc length).
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      width: Int = 30): DataFrame = {
    require(width >= 2, "width must be >= 2")
    val wins = windowDigests(
      widen(df.select(col(idCol), col(textCol)), idCol),
      idCol, textCol, width)
    dupSpansFromWindows(wins, idCol, width)
  }

  /** The stride-1 window-digest stream of [[duplicateSpans]]:
    * (idCol, pos, __k1, __k2) with (__k1, __k2) = a 128-bit double
    * xxhash64 digest of the `width`-char window at 1-based `pos` (the
    * [[exactByHash]] two-seed idiom: __k2 prepends a constant so the two
    * hashes are independent draws). Split out so a streaming index can
    * persist windows per batch (the text is scanned and hashed ONCE per
    * document, ever).
    *
    * The window stream is the DOMINANT intermediate of the curation
    * pipeline (≈ one row per corpus byte), and every downstream step
    * shuffles it (duplicate-key count, dup-key join, persisted index
    * state). Two longs (16 B) in place of the previous md5 hex string
    * (32-char UTF8String, ~45 B + pointer) cut those shuffle/state bytes
    * ~2.5× and replace a full MD5 + hex-encode per window with two
    * xxhash64 passes — guide §2.3 (narrower types / shuffle fewer bytes)
    * on the hottest scan of the 100 TB path. Equality of the 128-bit
    * pair is the same duplicate-window predicate the md5 key proxied
    * (both stand in for 30-char string equality; collision odds are
    * ~2⁻¹²⁸-scale either way), so span outputs are unchanged — the
    * DuckDB oracles keep their own md5 formulation and still agree.
    */
  private[graft] def windowDigests(df: DataFrame, idCol: String,
      textCol: String, width: Int): DataFrame =
    df.where(length(col(textCol)) >= width)
      .select(col(idCol),
        explode(sequence(lit(1), length(col(textCol)) - (width - 1)))
          .as("pos"),
        col(textCol))
      .select(col(idCol), col("pos"),
        xxhash64(col(textCol).substr(col("pos"), lit(width))).as("__k1"),
        xxhash64(lit(1L),
          col(textCol).substr(col("pos"), lit(width))).as("__k2"))

  /** Duplicated-window filter + gaps-and-islands merge over a window-digest
    * stream (one-shot or read back from a persisted index): keys occurring
    * ≥ 2 times survive, surviving positions merge into maximal spans.
    */
  private[graft] def dupSpansFromWindows(wins: DataFrame, idCol: String,
      width: Int): DataFrame =
    dupSpansFromWindowsWithKeys(wins,
      wins.groupBy("__k1", "__k2").agg(count(lit(1)).as("__n"))
        .where(col("__n") >= 2).select("__k1", "__k2"),
      idCol, width)

  /** [[dupSpansFromWindows]] with the duplicated-key set supplied by the
    * caller — the streaming index derives it from a PRE-AGGREGATED per-key
    * count sidecar ([[graft.streaming.SubstrIndexMaintainer.compact]])
    * instead of re-counting the full position index on every span read.
    */
  private[graft] def dupSpansFromWindowsWithKeys(wins: DataFrame,
      dupKeys: DataFrame, idCol: String, width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dupPos = wins.join(dupKeys, Seq("__k1", "__k2"))
      .select(col(idCol), col("pos"))
    // gaps-and-islands: windows [pos, pos+width-1] merge while they overlap
    // or touch; a break is a gap of more than `width` between starts
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dupPos
      .withColumn("__brk",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") > lag(col("pos"), 1).over(byDoc) + width, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(run))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + width).as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_len"),
        col("n_windows"))
  }

  /** The removal step of exact-substring dedup: every duplicated span
    * found by [[duplicateSpans]] is CUT from its document (all occurrences
    * removed — Lee et al. 2022's ExactSubstr policy), returning
    * (idCol, clean_text, n_cut_chars) for every input document.
    *
    * The cut itself is a map-side higher-order aggregate over the doc's
    * (sorted, provably non-overlapping) span list: the accumulator walks
    * (kept-prefix, next-uncut-position) and finishes with the tail — no
    * explode of characters, no UDF. Only the span LIST joins back to the
    * corpus (a few rows per affected doc), so the extra cost over
    * [[duplicateSpans]] is one small left join.
    */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
      width: Int = 30): DataFrame =
    removeSpansGiven(df, idCol, textCol,
      duplicateSpans(df, idCol, textCol, width))

  /** [[removeSpans]] with the span set supplied by the caller — the
    * derivation path of incremental curation, where spans come from the
    * persisted window index ([[graft.streaming.SubstrIndexMaintainer]])
    * instead of a fresh corpus scan. `spansIn`: (idCol, span_start,
    * span_len), non-overlapping per doc (what [[duplicateSpans]] emits).
    */
  def removeSpansGiven(df: DataFrame, idCol: String, textCol: String,
      spansIn: DataFrame): DataFrame = {
    val spans = spansIn
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("span_start").as("s"), col("span_len").as("l")))).as("__spans"))
    val text = col(textCol)
    // state: (kept prefix, 1-based position of the first uncut char);
    // substr takes INT positions — span offsets are longs, cast down
    // (document char offsets are < 2³¹ by construction)
    val cut = aggregate(col("__spans"),
      struct(lit("").as("acc"), lit(1).as("nxt")),
      (st, sp) => struct(
        concat(st.getField("acc"),
          text.substr(st.getField("nxt"),
            (sp.getField("s") - st.getField("nxt")).cast("int"))).as("acc"),
        (sp.getField("s") + sp.getField("l")).cast("int").as("nxt")),
      st => concat(st.getField("acc"),
        text.substr(st.getField("nxt"),
          (length(text) - st.getField("nxt") + 1).cast("int"))))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol), length(text).as("__len"),
        when(col("__spans").isNull, text).otherwise(cut).as("clean_text"))
      .select(col(idCol), col("clean_text"),
        (col("__len") - length(col("clean_text"))).cast("long")
          .as("n_cut_chars"))
  }

  /** Distinct word n-grams ("shingles") from a token array. Documents with
    * fewer than n tokens yield ZERO shingles (and thus never pair) — matching
    * the SQL-oracle semantics of generate_series over token positions.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** Exact n-gram Jaccard near-dup pairs: (id1, id2, jaccard ≥ threshold). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxShingleDocs: Option[Int] = None): DataFrame = {
    // widen BEFORE the shingle work (a projection below the exchange would
    // still evaluate on the scan's — possibly single — partitions), and keep
    // the shingle expression INLINE in the explode select: exploding a
    // named array column drags the whole array through the Generate output
    // row-by-row (measured 10× on this corpus).
    val docs = widen(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
    val gramsExpr = TextFns.wordShinglesNative(col("__t"), n)
    val ex0 = docs.select(col("id"), explode(gramsExpr).as("g"))
    val ex = maxShingleDocs match {
      case Some(f) =>
        val hot = ex0.groupBy("g").agg(count(lit(1)).as("df")).where(col("df") > f)
        ex0.join(hot, Seq("g"), "anti")
      case None => ex0
    }
    val inter = ex.select(col("g"), col("id").as("id1"))
      .join(ex.select(col("g"), col("id").as("id2")), Seq("g"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_inter"))
    val sizes = docs.select(col("id"), size(gramsExpr).as("sz"))
    inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), "id2")
      .select(col("id1"), col("id2"),
        (col("n_inter").cast("double") /
          (col("sz1") + col("sz2") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard with PREFIX FILTERING (AllPairs/PPJoin family) —
    * same output as [[jaccardPairs]], far fewer candidates at scale.
    *
    * Order every document's shingles by ascending global document frequency
    * (rare first); a pair with jaccard ≥ t must share ≥ ⌈t·|x|⌉ shingles, so
    * its (|x| − ⌈t·|x|⌉ + 1)-prefixes under the common order must intersect
    * (pigeonhole on the smallest shared element). Only prefixes are exploded
    * into the self-join — for t = 0.8 that's 20% of the shingles, skewed
    * toward RARE shingles, so the quadratic hot-shingle blow-up of the full
    * self-join collapses. Candidates get a length filter
    * (⌈t·max(|x|,|y|)⌉ ≤ min) and exact verification on the full sets —
    * precision and recall both 1.0.
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    jaccardPrefixImpl(
      widen(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id"),
      TextFns.wordShinglesNative(col("__t"), n), threshold)

  /** Character-shingle variant — the near-dup shape for text without
    * reliable tokenization (CJK, code); same prefix-filter machinery.
    */
  def charJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    jaccardPrefixImpl(
      widen(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id"),
      TextFns.charShinglesNative(col("__t"), n), threshold)

  /** `wdocs` is the widened (id, __t) frame; `gramsExpr` the shingle
    * expression over __t, kept inline in every explode (see [[jaccardPairs]]
    * on why a named array column is poison for Generate).
    */
  private def jaccardPrefixImpl(wdocs: DataFrame, gramsExpr: Column,
      threshold: Double): DataFrame = {
    val ex = wdocs
      .select(col("id"), size(gramsExpr).as("sz"), explode(gramsExpr).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("gdf"))
    // rank shingles rarest-first within each doc; epsilon guards a float
    // ceil overshoot (shorter prefix = unsafe; longer = just slower)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("gdf"), col("g"))
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
    val pref = ex.join(dfreq, "g")
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= prefixLen)
      .select(col("g"), col("id"), col("sz"))
    // materialized — read 3×: both candIds branches + the verify join
    val cands = graft.Exec.materialize(
      pref.select(col("g"), col("id").as("id1"), col("sz").as("sz1"))
        .join(pref.select(col("g"), col("id").as("id2"), col("sz").as("sz2")), Seq("g"))
        .where(col("id1") < col("id2") &&
          ceil(lit(threshold) * greatest(col("sz1"), col("sz2")) - lit(1e-9)) <=
            least(col("sz1"), col("sz2")))
        .select("id1", "id2").distinct())
    // exact verify only touches candidate docs: semi-join first, then
    // re-evaluate the shingle sets for that (structurally small) universe
    val candIds = cands.select(col("id1").as("id"))
      .unionAll(cands.select(col("id2").as("id"))).distinct()
    val vdocs = wdocs.join(candIds, Seq("id"), "semi")
      .select(col("id"), gramsExpr.as("grams"))
    val g1 = vdocs.select(col("id").as("id1"), col("grams").as("g1"))
    val g2 = vdocs.select(col("id").as("id2"), col("grams").as("g2"))
    cands.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // MinHash machinery -------------------------------------------------------

  /** Mersenne prime 2^31−1: universal-hash modulus. */
  val MinhashP = 2147483647L

  /** Deterministic permutation parameters (a·h + b) mod P, seeded once. */
  def permutations(numPerm: Int, seed: Long = 42L): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Seq.fill(numPerm)(1L + rnd.nextInt((MinhashP - 1).toInt).toLong)
    val bs = Seq.fill(numPerm)(rnd.nextInt(MinhashP.toInt).toLong)
    (as, bs)
  }

  /** MinHash signature (array of numPerm longs) from a shingle array —
    * single-row expression form. For corpus-scale signature computation use
    * [[minhashSignatures]] (aggregation form): a numPerm-wide nested
    * transform is quadratic work per row and resists codegen.
    */
  def minhashSignature(grams: Column, numPerm: Int, seed: Long = 42L): Column = {
    val (as, bs) = permutations(numPerm, seed)
    val aArr = typedLit(as)
    val bArr = typedLit(bs)
    val hashes = transform(grams, g => pmod(hash(g).cast("long"), lit(MinhashP)))
    transform(sequence(lit(0), lit(numPerm - 1)), i =>
      array_min(transform(hashes, h =>
        pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1), lit(MinhashP)))))
  }

  /** Corpus-scale MinHash signatures: explode shingles once, then ONE
    * hash-aggregate with numPerm `min` columns (vectorized, map-side
    * partial) — (id, sig ARRAY<LONG>). This is the 100 TB formulation: cost
    * is |corpus shingles| × numPerm fused multiply-mods inside codegen'd
    * partial aggregation, one shuffle on doc id.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, gramsCol: String,
      numPerm: Int, seed: Long = 42L): DataFrame = {
    val (as, bs) = permutations(numPerm, seed)
    val ex = docs.select(col(idCol), explode(col(gramsCol)).as("g"))
      .select(col(idCol), pmod(hash(col("g")).cast("long"), lit(MinhashP)).as("h"))
    val mins = (0 until numPerm).map(i =>
      min(pmod(lit(as(i)) * col("h") + lit(bs(i)), lit(MinhashP))).as(s"m$i"))
    ex.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numPerm).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup pairs with exact verification.
    *
    * shingle → minhash → band → bucket-join → verify: each doc emits `bands`
    * rows keyed by xxhash64(band index, band slice); docs sharing any band
    * bucket become candidates; candidates are verified with exact Jaccard on
    * their shingle sets, so precision is 1.0 and recall is the LSH S-curve
    * (≥ 1−(1−t^r)^b).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame =
    minhashLshFromGrams(
      widen(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id"),
      TextFns.wordShinglesNative(col("__t"), nGram),
      numPerm, bands, threshold, seed)

  /** Character-shingle LSH — the scale path for tokenization-free near-dup.
    * Unlike prefix filtering, LSH candidate volume is independent of how
    * hot the shingles are (docs × bands rows), which is what survives a
    * low-entropy corpus where every char shingle is shared by hundreds of
    * documents.
    */
  def charMinhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 5, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, seed: Long = 42L): DataFrame =
    minhashLshFromGrams(
      widen(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id"),
      TextFns.charShinglesNative(col("__t"), nGram),
      numPerm, bands, threshold, seed)

  /** `wdocs` is the widened (id, __t) frame; `gramsExpr` the shingle
    * expression over __t. The expression stays INLINE in both the signature
    * explode and the verify projection — naming the array column and
    * exploding it drags the whole array through the Generate output row by
    * row (measured 8× on the signature stage; see [[jaccardPairs]]).
    */
  private def minhashLshFromGrams(wdocs: DataFrame, gramsExpr: Column,
      numPerm: Int, bands: Int, threshold: Double, seed: Long,
      estMargin: Double = 0.2): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val r = numPerm / bands
    // The signature frame is read by three branches (band explode + both
    // sides of the signature screen); without materialization each branch
    // re-runs the shingle + signature computation — the pipeline's dominant
    // cost. One row of numPerm longs per doc, so the materialized frame is
    // tiny relative to the corpus it summarizes. Signatures come from the
    // one-pass native expression (same values as the explode + min-aggregate
    // form in [[minhashSignatures]], minus the |shingles| × numPerm row
    // explosion through an exchange); docs with no shingles are filtered
    // exactly as the aggregation form drops them.
    val sigs = graft.Exec.materialize(
      wdocs.select(col("id"),
          graft.functions.TextFns.minhashSigNative(gramsExpr, numPerm, seed)
            .as("sig"))
        .where(size(col("sig")) > 0))
    val banded = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))).as("bkey"))
    val cands = banded.select(col("bkey"), col("id").as("id1"))
      .join(banded.select(col("bkey"), col("id").as("id2")), Seq("bkey"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    // signature-estimate screen before the exact verify: matching minhash
    // positions / numPerm ≈ jaccard, so candidates estimating below
    // threshold − estMargin can't verify (Hoeffding: a j ≥ threshold pair
    // under-estimates by ≥ estMargin w.p. ≤ exp(−2·estMargin²·numPerm) ≈
    // 0.6% at 64 perms, and band-collision already required one full band
    // match). This bounds the expensive shingle-set intersection to
    // near-duplicates instead of every band collision — on a low-entropy
    // corpus band collisions from mid-jaccard pairs dominate otherwise.
    val estMin = math.max(0.0, math.ceil((threshold - estMargin) * numPerm)).toInt
    // materialized — read 3×: both candIds branches + the verify join
    val screened = graft.Exec.materialize(cands
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .where(graft.functions.VectorFns.matchCount(col("sig1"), col("sig2")) >= estMin)
      .select("id1", "id2"))
    // Exact verify touches only candidate docs — semi-join the id set first
    // so the shingle arrays are re-evaluated for the (structurally small)
    // candidate universe, not the whole corpus.
    val candIds = screened.select(col("id1").as("id"))
      .unionAll(screened.select(col("id2").as("id"))).distinct()
    val vdocs = wdocs.join(candIds, Seq("id"), "semi")
      .select(col("id"), gramsExpr.as("grams"))
    val g1 = vdocs.select(col("id").as("id1"), col("grams").as("g1"))
    val g2 = vdocs.select(col("id").as("id2"), col("grams").as("g2"))
    screened.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Incremental near-dup detection: NEW docs (`deltaIds`, a subset of
    * `docs`) against a PERSISTED signature index of the existing corpus
    * (`index`: (id, sig ARRAY<LONG>) as written by [[minhashSignatures]]
    * with the same (nGram, numPerm, seed)), plus within-delta pairs — the
    * production shape for continuously-ingested corpora: ONLY the delta is
    * shingled and signed each batch; the corpus side is probed through its
    * precomputed signatures and never rebuilt, so per-batch cost is
    * O(|delta| × bands) candidate probes + the exact verify on candidate
    * docs, independent of corpus size at fixed collision rate.
    *
    * Returns (id1, id2, jaccard) with id1 < id2, jaccard ≥ threshold, and
    * at least one side in the delta; precision 1.0 (exact verify), recall =
    * the same LSH S-curve as [[minhashLshPairs]]. Caller contract: `index`
    * covers exactly the docs NOT in `deltaIds`.
    */
  def incrementalLshPairs(docs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, deltaIds: DataFrame, nGram: Int = 3,
      numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      seed: Long = 42L, estMargin: Double = 0.2,
      deltaSigsOpt: Option[DataFrame] = None): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val r = numPerm / bands
    val wdocs = widen(docs.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
    val gramsExpr = TextFns.wordShinglesNative(col("__t"), nGram)
    val dIds = deltaIds.select(col(deltaIds.columns.head).as("id"))
    // deltaSigsOpt: a caller that already signed the batch (e.g. the
    // streaming maintainer, which persists the signatures anyway) passes
    // them in instead of paying the shingle+sign pass twice
    val deltaSigs = deltaSigsOpt.map(_.select(col("id"), col("sig")))
      .getOrElse(graft.Exec.materialize(
        wdocs.join(dIds, Seq("id"), "semi")
          .select(col("id"),
            graft.functions.TextFns.minhashSigNative(gramsExpr, numPerm, seed)
              .as("sig"))
          .where(size(col("sig")) > 0)))
    val idxSigs = index.select(col("id"), col("sig"))
    def banded(s: DataFrame): DataFrame = s.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))).as("bkey"))
    val bd = graft.Exec.materialize(banded(deltaSigs)) // read twice
    // corpus×delta: the (large) index side streams through ONE equi-join
    // keyed by the delta's band keys — at scale, broadcast bd and the index
    // never shuffles at all; delta×delta: self-join of the small frame
    val crossCands = banded(idxSigs).select(col("bkey"), col("id").as("ia"))
      .join(bd.select(col("bkey"), col("id").as("ib")), Seq("bkey"))
      .select(least(col("ia"), col("ib")).as("id1"),
        greatest(col("ia"), col("ib")).as("id2"))
    val deltaCands = bd.select(col("bkey"), col("id").as("id1"))
      .join(bd.select(col("bkey"), col("id").as("id2")), Seq("bkey"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2")
    val cands = crossCands.unionAll(deltaCands).distinct()
    // signature screen + exact verify: same contract as the full LSH path
    val sigs = idxSigs.unionAll(deltaSigs)
    val estMin = math.max(0.0, math.ceil((threshold - estMargin) * numPerm)).toInt
    val screened = graft.Exec.materialize(cands
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .where(graft.functions.VectorFns.matchCount(col("sig1"), col("sig2")) >= estMin)
      .select("id1", "id2"))
    val candIds = screened.select(col("id1").as("id"))
      .unionAll(screened.select(col("id2").as("id"))).distinct()
    val vdocs = wdocs.join(candIds, Seq("id"), "semi")
      .select(col("id"), gramsExpr.as("grams"))
    screened
      .join(vdocs.select(col("id").as("id1"), col("grams").as("g1")), "id1")
      .join(vdocs.select(col("id").as("id2"), col("grams").as("g2")), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected edge list (id1, id2) → one row
    * per member node (id, rep) where rep is the smallest node id in its
    * component — turns near-dup PAIRS into dedup GROUPS (keep rep, drop the
    * rest).
    *
    * Algorithm, size-adaptive: near-dup edge sets are usually a vanishing
    * fraction of the corpus (pairs above a high threshold), so when the edge
    * list fits comfortably on the driver ([[LocalCcEdgeLimit]]) the
    * components are solved in one collect with path-compressed union-find —
    * an iterative dataflow loop over a few thousand edges is pure job-
    * scheduling overhead. Above the limit: iterated min-label propagation
    * with pointer jumping — each round (a) every node adopts the min of its
    * own and its neighbors' labels, then (b) re-reads its (new) label's label
    * (path halving), so label chains collapse in O(log diameter) rounds
    * instead of O(diameter); one shuffle join + one aggregation + one label
    * self-join per round, AQE sizing the joins. Convergence = zero rows
    * changed labels this round — counted on the round's output frame, so the
    * check is type-agnostic (works for string/any orderable key, unlike a
    * numeric label-sum). If `maxIter` rounds pass without convergence the
    * call THROWS rather than returning partially-propagated groups: silent
    * wrong output from a correctness-gated operator is never acceptable.
    */
  def connectedComponents(pairs: DataFrame, id1: String = "id1",
      id2: String = "id2", maxIter: Int = 25,
      localEdgeLimit: Int = LocalCcEdgeLimit): DataFrame = {
    val keyType = pairs.schema(id1).dataType
    val localOrd: Option[Ordering[Any]] = keyType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        Some(Ordering.by((x: Any) => x.asInstanceOf[Number].longValue()))
      case org.apache.spark.sql.types.StringType =>
        Some(Ordering.by((x: Any) => x.toString))
      case _ => None
    }
    if (localOrd.isDefined && localEdgeLimit > 0) {
      // rows are not bytes: string ids shrink the row bound by their
      // sampled width so the collect stays inside LocalCcByteBudget
      // NO floor: if the byte budget admits fewer edges than any useful
      // local graph (ids can be arbitrarily wide — the budget contract says
      // wide ids cannot blow the driver), fall through to the distributed
      // path instead of collecting over-budget. The 512-row sample is
      // unordered and can underestimate width, so the widest sampled row —
      // not the mean — bounds the estimate.
      val effLimit = keyType match {
        case org.apache.spark.sql.types.StringType =>
          val sample = pairs.select(col(id1), col(id2)).limit(512).collect()
          if (sample.isEmpty) localEdgeLimit
          else {
            val widths = sample.iterator.map(r =>
              r.getString(0).length + r.getString(1).length + 64L).toSeq
            val bound = (widths.sum / sample.length + widths.max) / 2
            math.min(localEdgeLimit.toLong, LocalCcByteBudget / bound).toInt
          }
        case _ => localEdgeLimit
      }
      if (effLimit >= 64) { // below this the local path saves nothing
        val head = pairs.select(col(id1).as("a"), col(id2).as("b"))
          .limit(effLimit + 1).collect()
        if (head.length <= effLimit)
          return localComponents(pairs.sparkSession, head, keyType, localOrd.get)
      }
    }
    val spark = pairs.sparkSession
    // Iterative dataflow MUST truncate lineage every round: the pointer-jump
    // self-join references the round's plan twice, so without truncation the
    // logical tree DOUBLES per iteration (exponential analysis/toString cost
    // long before any data moves). Reliable checkpoint when the session has
    // a checkpoint dir (survives executor loss — set one in production);
    // localCheckpoint otherwise (executor-loss tradeoff documented in
    // graft.Exec.materialize).
    val truncate: DataFrame => DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df => df.checkpoint()
      else df => df.localCheckpoint()
    val edges = pairs.select(col(id1).as("a"), col(id2).as("b"))
      .unionAll(pairs.select(col(id2).as("a"), col(id1).as("b")))
      .distinct()
      .cache()
    var labels = edges.select(col("a").as("node"))
      .distinct()
      .select(col("node"), col("node").as("rep"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (a) each node adopts the min of its own label and its neighbors'
      val prop = edges
        .join(labels.select(col("node").as("b"), col("rep").as("nbrRep")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nbrRep")).as("nbrMin"))
        .join(labels, Seq("node"))
        .select(col("node"), least(col("rep"), col("nbrMin")).as("rep"),
          (col("nbrMin") < col("rep")).as("__chg"))
        .cache()
      // (b) pointer jump (path halving): rep ← rep's label. Every rep value
      // IS a node of the graph (labels start as the node itself and only
      // ever adopt other nodes' labels), so the left join never misses;
      // coalesce is belt and braces.
      val jump = prop.select(col("node").as("rep"), col("rep").as("rep2"))
      val next = truncate(prop.join(jump, Seq("rep"), "left")
        .select(col("node"),
          coalesce(col("rep2"), col("rep")).as("rep"),
          (col("__chg") ||
            coalesce(col("rep2"), col("rep")) =!= col("rep")).as("__chg")))
      // one count over the (already materialized) round detects convergence —
      // no label arithmetic, so any orderable key type (long, string, …) works
      val changed = next.where(col("__chg")).count()
      prop.unpersist()
      labels = next.select("node", "rep")
      converged = changed == 0L
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; " +
          "with pointer jumping this needs diameter > 2^" + maxIter +
          " — raise maxIter or inspect the edge list for pathological input")
    labels
  }

  /** Edge-count bound for the driver-local union-find path — exact for
    * fixed-width numeric ids (2M × 16 B = 32 MB); string-keyed graphs scale
    * the row bound down by the sampled id width against
    * [[LocalCcByteBudget]], so arbitrarily long ids cannot blow the driver.
    */
  val LocalCcEdgeLimit: Int = 2 * 1000 * 1000

  /** Driver-memory budget for string-keyed local union-find (bytes). */
  val LocalCcByteBudget: Long = 64L << 20

  /** Path-compressed union-find over a collected edge list; rep = smallest
    * node per component under `ord` — identical output contract to the
    * distributed loop.
    */
  private def localComponents(spark: org.apache.spark.sql.SparkSession,
      edges: Array[org.apache.spark.sql.Row],
      keyType: org.apache.spark.sql.types.DataType,
      ord: Ordering[Any]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val parent = new java.util.HashMap[Any, Any]()
    def add(x: Any): Unit = if (!parent.containsKey(x)) parent.put(x, x)
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { e =>
      val a = e.get(0); val b = e.get(1)
      add(a); add(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(ra, rb)
    }
    val nodes = parent.keySet().asScala.toArray
    val minOf = new java.util.HashMap[Any, Any]()
    nodes.foreach { n =>
      val r = find(n)
      val cur = minOf.get(r)
      if (cur == null || ord.lt(n, cur)) minOf.put(r, n)
    }
    val rows = nodes.map(n =>
      org.apache.spark.sql.Row(n, minOf.get(find(n)))).toSeq.asJava
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", keyType),
        org.apache.spark.sql.types.StructField("rep", keyType))))
  }

  // SimHash machinery -------------------------------------------------------

  private val SimBits = 60 // 15 md5 hex nibbles; positive in a signed Long

  /** 60-bit SimHash over word tokens: md5-prefix hash per token (engine-
    * portable — see [[graft.functions.TextExprUtil.md5Prefix60]]), per-bit
    * ±1 vote sums, sign of each sum becomes the bit. HOF reference form of
    * the codegen'd [[graft.functions.TextFns.simhashNative]].
    */
  def simhash60(text: Column): Column = {
    val powers = typedLit((0 until SimBits).map(b => 1L << b))
    val toks = TextOps.tokens(text)
    val votes = aggregate(toks,
      typedLit(Seq.fill(SimBits)(0)),
      (acc, t) => {
        val h = conv(substring(md5(t), 1, 15), 16, 10).cast("long")
        zip_with(acc, powers, (a, p) =>
          a + when(h.bitwiseAND(p) =!= 0L, 1).otherwise(-1))
      })
    aggregate(zip_with(votes, powers,
      (v, p) => when(v >= 0, p).otherwise(0L)), lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-dup pairs: 15-bit block bucketing (4 blocks over 60 bits →
    * any pair with hamming ≤ 3 shares at least one block: pigeonhole),
    * verified by exact hamming distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = widen(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .select(col("id"), TextFns.simhashNative(col("__t")).as("sim"))
    val blocks = sigs.select(col("id"), col("sim"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"),
          shiftright(col("sim"), i * 15).bitwiseAND(lit(0x7FFFL)).as("v"))): _*)).as("b"))
    val cands = blocks.select(col("b"), col("id").as("id1"), col("sim").as("s1"))
      .join(blocks.select(col("b"), col("id").as("id2"), col("sim").as("s2")), Seq("b"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2", "s1", "s2").distinct()
    cands.select(col("id1"), col("id2"),
      bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
