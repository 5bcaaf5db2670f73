package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder-prompt
  * "beyond the reference" surface): token stats, stopword/punctuation ratios,
  * a composable quality score, n-gram-heuristic language ID, and a
  * deterministic polynomial fingerprint.
  *
  * Everything here is a native Catalyst column expression (higher-order
  * functions, no UDFs) so it stays inside whole-stage codegen and scales as a
  * pure map — no shuffle, no driver involvement, safe at 100 TB. Arithmetic is
  * modular (mod 1e9+7) so ANSI overflow checking never fires.
  */
object TextOps {

  /** Whitespace tokenization — the BPE-ish regex split is [[tokensRe]]. */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenization: words / numbers / single punctuation, a cheap BPE-ish
    * pre-tokenizer split.
    */
  def tokensRe(text: Column): Column =
    filter(split(text, """[^\p{L}\p{N}]+"""), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, """[\p{Punct}]""", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** English stopword core — shared with the DuckDB oracle (PipelineQueries). */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def stopRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Mean token length over non-space characters. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") /
      greatest(size(tokens(text)), lit(1))

  /** Heuristic quality score in [0,1]: four equally-weighted gates (token
    * count, stopword ratio, mean token length, document size) — the classic
    * Gopher/C4-style rule shape, deterministic and SQL-portable.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val sr = stopRatio(text)
    val ml = meanTokenLen(text)
    val gate = (c: Column) => when(c, lit(0.25)).otherwise(lit(0.0))
    gate(nTok.between(10, 1000)) +
      gate(sr.between(0.05, 0.6)) +
      gate(ml.between(3.0, 10.0)) +
      gate(charCount(text) <= 20000)
  }

  /** Stopword profiles for the n-gram-heuristic language ID. Priority order on
    * ties: en > fr > es > de > zh (mirrored in the oracle's CASE chain).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "les", "des"),
    "es" -> Seq("el", "la", "de", "y", "un", "es", "los", "que"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "von", "zu"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def langScore(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** argmax over profile scores with the fixed priority order (CASE chain so
    * the DuckDB oracle is textually parallel).
    */
  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (l, ws) => l -> langScore(text, ws) }
    val chain = scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), els) =>
        val rest = scores.drop(i + 1)
        if (rest.isEmpty) els
        else when(rest.map { case (_, s2) => s >= s2 }.reduce(_ && _), lit(lang))
          .otherwise(els)
    }
    chain
  }

  /** Deterministic document fingerprint: polynomial rolling hash over
    * characters, mod 1e9+7 (overflow-free under ANSI; identical arithmetic is
    * expressible in DuckDB via list_reduce for the oracle).
    */
  def fingerprint(text: Column): Column =
    aggregate(filter(split(text, ""), ch => length(ch) > 0), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** Deterministic bag-of-words TEXT EMBEDDING into R^dim — the text side
    * of cross-modal retrieval plumbing: each word's polynomial fingerprint
    * (the [[fingerprint]] fold) seeds a modular projection weight per
    * output coordinate, summed in exact integer space with ONE final
    * division (order-free, engine-reproducible — the
    * [[Multimodal.imageEmbeddingBatch]] discipline applied to text). A
    * learned text tower swaps in by replacing the weight function; the
    * pure-map shape, output contract, and downstream ANN machinery are
    * already what it needs.
    */
  def textEmbedding(text: Column, dim: Int): Column = {
    val toks = filter(tokens(text), t => length(t) > 0)
    val fps = transform(toks, w =>
      aggregate(filter(split(w, ""), ch => length(ch) > 0), lit(0L),
        (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L))
    val n = greatest(size(toks), lit(1))
    transform(sequence(lit(0), lit(dim - 1)), k =>
      aggregate(fps, lit(0L),
        (acc, f) => acc + ((f + k.cast("long") * 4001L) % 97L - 48L))
        .cast("double") / (lit(48.0) * n))
  }

  /** Winnowing-style k-gram min-fingerprint (murmur3; not oracle-portable —
    * gated by spec instead).
    */
  def minGramFingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(Dedup.wordNgrams(tokens(text), k), g => hash(g)))

  /** Within-document repetition: 1 − (distinct n-grams / total n-grams) —
    * the Gopher-style duplication signal (high = boilerplate/looping text).
    * SQL-portable; 0 for docs shorter than n tokens.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val total = greatest(size(toks) - (n - 1), lit(0))
    val distinctGrams = size(Dedup.wordNgrams(toks, n))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) - distinctGrams.cast("double") / total)
  }

  /** HTML → text extraction — the web-crawl ingest step upstream of every
    * quality filter: drops <script>/<style> subtrees entirely (their text
    * is code, not content), strips remaining tags to spaces, decodes the
    * common entities, and collapses whitespace. Every pattern is
    * RE2-compatible (no backreferences, inline (?s) only), so the DuckDB
    * oracle runs the IDENTICAL chain; pure map-side codegen.
    */
  def extractHtmlText(html: Column): Column = {
    val noScript = regexp_replace(html, """(?s)<script.*?</script>""", " ")
    val noStyle = regexp_replace(noScript, """(?s)<style.*?</style>""", " ")
    val noTags = regexp_replace(noStyle, """<[^>]*>""", " ")
    // entity names contain no regex metacharacters — plain patterns
    val ent = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, from, to)
      }
    trim(regexp_replace(ent, """\s+""", " "))
  }

  /** Canonical text normalization — the first stage of every ingest
    * pipeline, and the precondition for hash-based dedup to work at all
    * (NFC: visually-identical é as e+combining-accent vs precomposed é must
    * hash equal): Unicode NFC (native codegen expression,
    * [[graft.functions.TextFns.nfc]]) → whitespace runs (space/tab/CR/LF)
    * collapsed to one space → edge-trimmed. Map-side only; each step is
    * engine-portable (DuckDB `nfc_normalize` + `regexp_replace(..., 'g')` +
    * `trim`).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(graft.functions.TextFns.nfc(text), """\s+""", " "))

  /** PII redaction: emails and long digit runs replaced with placeholder
    * tokens. Patterns kept RE2-compatible so the same regex runs in the
    * DuckDB oracle.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>")
    regexp_replace(noEmail, """[0-9][0-9 ()+.-]{7,}[0-9]""", "<PHONE>")
  }

  /** Overlapping token-window chunking — the context-window splitter for
    * training pipelines: windows of `size` tokens every `stride` tokens
    * (stride < size ⇒ overlap). Only full windows are emitted; docs shorter
    * than `size` tokens yield a single truncated chunk covering the whole
    * doc, so no document disappears. Returns ARRAY<STRUCT<chunk_idx, chunk>>
    * — explode downstream. Map-side only (no shuffle); SQL-portable (list
    * slicing in the oracle).
    */
  def slidingChunks(text: Column, width: Int, stride: Int): Column = {
    require(width >= 1 && stride >= 1, "width and stride must be >= 1")
    val toks = tokens(text)
    val nTok = size(toks)
    val nWin = floor((nTok - width + stride) / stride).cast("int")
    val idxs = when(nTok >= width, sequence(lit(0), nWin - 1))
      .otherwise(sequence(lit(0), lit(0)))
    transform(idxs, i => struct(i.cast("long").as("chunk_idx"),
      array_join(slice(toks, i * stride + 1, lit(width)), " ").as("chunk")))
  }

  /** Distinct character n-grams — the classic near-dup shingle for text
    * without reliable tokenization (CJK, code). SQL-portable (substr loop).
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style quality-rule audit (the published repetition/format
    * heuristics of Rae et al. 2021 §A1.1.2, bounds recalibrated to this
    * corpus profile): per-document measured stats plus a failed-rule
    * bitmask, so downstream selection can both filter (`fail_mask = 0`)
    * and attribute every rejection to the rule that fired. Bits:
    *   1  word count outside [minWords, maxWords]
    *   2  mean word length outside [3, 10]
    *   4  alphabetic-word fraction < 0.8
    *   8  fewer than 2 distinct stopwords present ("stop word" rule)
    *   16 unique-word fraction < minUniqueFrac (duplication rule)
    * Pure map-side column arithmetic over the token array — no shuffle, no
    * UDF; every ratio is a quotient of integers, so the DuckDB oracle
    * reproduces it bit-exactly (doubles rounded to 6 for the compare).
    */
  def gopherAudit(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minWords: Int = 25, maxWords: Int = 90,
      minUniqueFrac: Double = 0.3,
      minStopwords: Int = 2): org.apache.spark.sql.DataFrame = {
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val nw = size(toks)
    val denom = greatest(nw, lit(1))
    val mwl = length(regexp_replace(col(textCol), " ", "")).cast("double") / denom
    val af = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / denom
    // count how many of the FIXED stopword list occur (distinct-stopword
    // count, not token hits): iterate the constant list, not the document
    val nStop = size(filter(
      lit(StopwordsEn.toArray), s => array_contains(toks, s)))
    val uf = size(array_distinct(toks)).cast("double") / denom
    val bit = (c: Column, b: Int) => when(c, lit(0L)).otherwise(lit(b.toLong))
    docs.select(col(idCol),
      nw.cast("long").as("n_words"),
      round(mwl, 6).as("mean_wlen"),
      round(af, 6).as("alpha_frac"),
      nStop.cast("long").as("n_stop"),
      round(uf, 6).as("uniq_frac"),
      (bit(nw.between(minWords, maxWords), 1) +
        bit(mwl >= 3.0 && mwl <= 10.0, 2) +
        bit(af >= 0.8, 4) +
        bit(nStop >= minStopwords, 8) +
        bit(uf >= minUniqueFrac, 16)).as("fail_mask"))
  }
}

/** TF-IDF over the tokenized corpus — pure DataFrame ops, one shuffle per
  * aggregation level, no ML-pipeline state. Scale: term exploding is linear
  * in corpus tokens; document frequency is a (term) aggregate; everything
  * stays keyed by (doc, term) — no driver-side vocabulary.
  */
object TfIdf {
  import org.apache.spark.sql.DataFrame

  /** (id, term, tf, df, tfidf) with tfidf = tf · ln(N / df); raw term counts
    * as tf (the reference-free, oracle-friendly convention).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    val terms = Dedup.widen(docs.select(col(idCol).as("id"),
      col(textCol).as("__text")), "id")
      .select(col("id"), explode(TextOps.tokens(col("__text"))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf") * log(lit(n.toDouble) / col("df"))).as("tfidf"))
  }

  /** BM25-scored keyword retrieval — the corpus-mining search op (seed-set
    * expansion, decontamination sweeps, topical slicing): score(d, Q) =
    * Σ_{t∈Q} ln((N−df+0.5)/(df+0.5)+1) · tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl))
    * (the Robertson idf with Lucene's +1 floor). The term stream filters to
    * the query's terms BEFORE any aggregation, so the shuffle carries only
    * matching postings — corpus scale costs one map-side filtered pass
    * plus a query-sized join. Returns the top-k (idCol, score, rank).
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame =
    bm25FromPostings(postings(docs, idCol, textCol), idCol, query, k, k1,
      b, roundTo)

  /** The inverted-index rows BM25 consumes: (idCol, term, tf) — one row
    * per (document, distinct term). Every doc contributes ≥ 1 row (the
    * whitespace split of any string is non-empty), so document count and
    * length derive FROM the postings (len = Σ tf).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** BM25 over an ALREADY-BUILT postings frame (idCol, term, tf) — the
    * derivation a persistent search index serves queries from: corpus
    * stats (N, avgdl), document lengths, and query-term df all come from
    * the postings alone, so an incrementally-maintained index answers
    * identically to a one-shot scan.
    */
  def bm25FromPostings(post: DataFrame, idCol: String, query: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame =
    bm25FromPostingsWithLengths(post,
      post.groupBy(col(idCol)).agg(sum(col("tf")).as("len")),
      idCol, query, k, k1, b, roundTo)

  /** [[bm25FromPostings]] with the per-document lengths SUPPLIED —
    * the serving split: a persistent index keeps (idCol, len) as a
    * compacted sidecar ([[graft.streaming.SearchIndexMaintainer]]), so a
    * query aggregates a one-row-per-doc frame for (N, avgdl) instead of
    * re-collapsing the full per-(doc, term) postings every request.
    * Lengths MUST cover exactly the documents in `post` (len = Σ tf).
    */
  def bm25FromPostingsWithLengths(post: DataFrame, lengths: DataFrame,
      idCol: String, query: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    require(query.nonEmpty, "bm25: empty query")
    import org.apache.spark.sql.expressions.Window
    val dl = lengths.select(col(idCol).as("id"), col("len")).cache()
    val statRow = dl.agg(count(lit(1)), sum(col("len"))).head()
    val n = statRow.getLong(0)
    val avgdl = statRow.getLong(1).toDouble / n
    val tf = post.where(col("term").isin(query: _*))
      .select(col(idCol).as("id"), col("term"), col("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val scored = tf.join(broadcast(df), Seq("term")).join(dl, Seq("id"))
      .groupBy("id")
      .agg(sum(idf * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgdl)))
        .as("score"))
    // top-k FIRST (TakeOrderedAndProject — no corpus-wide single-partition
    // exchange), then rank the k survivors; the window sees k rows only
    val top = scored
      .orderBy(round(col("score"), roundTo).desc, col("id")).limit(k)
    val w = Window.orderBy(round(col("score"), roundTo).desc, col("id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("id").as(idCol), round(col("score"), roundTo).as("score"),
        col("rank").cast("long").as("rank"))
  }

  /** [[bm25FromPostings]] for a BATCH of queries — the decontamination /
    * eval-retrieval shape: `queries` is a (qidCol, termCol) frame, one row
    * per query term (re-distincted defensively). Corpus stats (N, avgdl,
    * lengths, per-term df) derive from the postings exactly as in the
    * single-query form, and every query ranks against the same index in
    * ONE pass. Scale shape: the query vocabulary (an eval suite — the
    * bounded dim side) broadcasts, postings are filtered to queried terms
    * BEFORE any shuffle so the shuffle carries only matching postings,
    * and the top-k is a per-query PARTITIONED window (each partition
    * holds one query's matches) — never a corpus-wide global sort.
    */
  def bm25SearchBatch(post: DataFrame, idCol: String, queries: DataFrame,
      qidCol: String, termCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75, roundTo: Int = 6): DataFrame =
    bm25SearchBatchWithLengths(post,
      post.groupBy(col(idCol)).agg(sum(col("tf")).as("len")),
      idCol, queries, qidCol, termCol, k, k1, b, roundTo)

  /** [[bm25SearchBatch]] with the per-document lengths SUPPLIED — the
    * serving split ([[bm25FromPostingsWithLengths]]) for the batch form:
    * a maintained index answers a whole eval suite from state.
    */
  def bm25SearchBatchWithLengths(post: DataFrame, lengths: DataFrame,
      idCol: String, queries: DataFrame,
      qidCol: String, termCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dl = lengths.select(col(idCol).as("id"), col("len")).cache()
    val statRow = dl.agg(count(lit(1)), sum(col("len"))).head()
    val n = statRow.getLong(0)
    val avgdl = statRow.getLong(1).toDouble / n
    val q = queries.select(col(qidCol).as("__qid"),
      col(termCol).as("term")).distinct()
    val qterms = q.select("term").distinct()
    val tfq = post.join(broadcast(qterms), Seq("term"))
      .select(col(idCol).as("id"), col("term"), col("tf"))
    val df = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val contrib = tfq.join(broadcast(df), Seq("term")).join(dl, Seq("id"))
      .select(col("term"), col("id"),
        (idf * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgdl)))
          .as("__c"))
    val scored = contrib.join(broadcast(q), Seq("term"))
      .groupBy(col("__qid"), col("id"))
      .agg(sum(col("__c")).as("score"))
    val w = Window.partitionBy("__qid")
      .orderBy(round(col("score"), roundTo).desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as(qidCol), col("id").as(idCol),
        round(col("score"), roundTo).as("score"),
        col("rank").cast("long").as("rank"))
  }

  /** HYBRID retrieval fusion — reciprocal-rank fusion (RRF, the standard
    * score-free combiner) of two ranked lists, e.g. BM25 and a dense
    * tower: rrf(q, d) = Σ_lists 1/(c + rank), absent membership
    * contributing 0. Rank-based, so the two retrievers' incomparable
    * score scales never need calibration. Inputs are (queryCol, idCol,
    * rank) frames; output the fused per-query top-k: (queryCol, idCol,
    * rrf, rank).
    *
    * Scale shape: both inputs are already per-query top-k' (bounded), so
    * the fusion join and the per-query re-rank window touch ≤ 2k'
    * candidates per query — never a corpus-sized frame.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String, idCol: String,
      k: Int, c: Int = 60, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val fa = a.select(col(queryCol), col(idCol), col("rank").as("__ra"))
    val fb = b.select(col(queryCol), col(idCol), col("rank").as("__rb"))
    val fused = fa.join(fb, Seq(queryCol, idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("__rb")), lit(0.0)), roundTo))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryCol), col(idCol), col("rrf"),
        col("rank").cast("long").as("rank"))
  }

  /** Top-k highest-tfidf terms per document (deterministic tie-break). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id")
      .orderBy(round(col("tfidf"), roundTo).desc, col("term"))
    tfidf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("id").as(idCol), col("term"), col("rank").cast("long").as("rank"),
        round(col("tfidf"), roundTo).as("tfidf"))
  }
}
