package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Joins, Sessions, Skew, TextOps}

/** Extended-operator gate queries built through the DataFrame API (the ops
  * have no single-statement SQL form): as-of join, binned range join,
  * deterministic hash sampling, and chunk-level span dedup. Each carries a
  * DuckDB oracle (ASOF JOIN / BETWEEN join / md5 / list slicing are all
  * portable).
  */
object ExtQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Point-in-time lookup: for every view event, the latest click event of
    // the same user at or before the view instant (merge-sweep as-of join).
    "q_asof" -> ((s, d) => {
      val ev = Tables.read(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      val clicks = ev.where(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      Joins.asofJoin(views, clicks, on = "ts", by = "user_id",
        valueCols = Seq("event_id", "value"), tieBreak = "event_id")
        // DuckDB reads this TIMESTAMP(NANOS) column at µs precision, so the
        // comparable output grain is µs (sub-µs ties are invisible to it)
        .select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("ts_us"),
          col("asof_event_id").as("click_id"), col("asof_value").as("click_value"))
    }),
    // Point-in-interval range join: orders priced within ±1% of selected
    // customers' maximum order price (binned equi-join + exact refine).
    "q_range" -> ((s, d) => {
      val orders = Tables.read(s, d, "orders")
      val iv = orders.where(col("o_custkey") % 50 === 0)
        .groupBy(col("o_custkey").as("cust"))
        .agg((max(col("o_totalprice")) * 0.99).as("lo"),
          (max(col("o_totalprice")) * 1.01).as("hi"))
      val pts = orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
      Joins.rangeJoinBinned(pts, iv, "price", "lo", "hi", binWidth = 10000.0)
        .select(col("cust"), col("o_orderkey"), col("price"))
    }),
    // Deterministic hash sampling: stable 1/16 sample keyed on md5(doc_id) —
    // the reproducible train/eval split primitive (no RNG state, identical
    // on any engine, any partitioning, any run).
    "p_sample_hash" -> ((s, d) =>
      Tables.read(s, d, "documents")
        .where(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
        .select(col("doc_id"), col("n_chars"))),
    // Salted two-phase aggregation on a hot key (3 distinct return flags
    // over 600k rows — exactly the shape that melts one reducer unsalted):
    // partial sums on (key, salt), merge per key. Integer-exact value so
    // the result is bitwise order-independent and equals the plain SUM.
    "q_salted_agg" -> ((s, d) => {
      val li = Tables.read(s, d, "lineitem")
        .select(col("l_returnflag"), floor(col("l_quantity")).cast("long").as("q"))
      Skew.saltedSum(li, Seq("l_returnflag"), "q", salt = 8)
    }),
    // The SQL-function surface: the engine's native codegen expressions
    // reached through plain spark.sql (the extension injects these at
    // session build; here they register into the gate session's function
    // registry at runtime — same builders, same expressions).
    "q_sql_funcs" -> ((s, d) => {
      graft.sql.GraftSql.nativeFunctions.foreach { case (ident, info, builder) =>
        s.sessionState.functionRegistry.registerFunction(ident, info, builder)
      }
      Tables.read(s, d, "documents").createOrReplaceTempView("documents")
      // the fold/nfc column splices an NFD suffix (e + combining acute,
      // U+0301) so normalization does real work on this ASCII corpus
      val comb = "\u0301"
      s.sql(s"""SELECT doc_id,
               |  size(graft_word_shingles(text, 3)) AS n_sh,
               |  size(graft_char_shingles(text, 5)) AS n_cs,
               |  round(graft_dot(array(cast(n_chars as double)),
               |                  array(cast(n_chars as double))), 6) AS sq,
               |  graft_fold_accents(graft_nfc(
               |    concat(substring(text, 1, 12), ' cafe$comb'))) AS folded,
               |  round(graft_char_entropy(text), 6) AS ent
               |FROM documents""".stripMargin)
    }),
    // Batch gap-based sessionization: per-user 30-minute-gap sessions with
    // bounds/duration/count — one shuffle on the user key, two windowed
    // passes (the batch twin of the streaming sessionizer).
    "q_sessions" -> ((s, d) => {
      val ev = Tables.read(s, d, "events")
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"))
      Sessions.sessionStats(ev, "user_id", "ts_us", gap = 1800L * 1000000L)
    }),
    // Keyed upsert sink round-trip (the ModifyTable UPDATE slot): base =
    // view events, delta = click events re-keyed onto the same (user, day)
    // keys with a higher version — read-back must hold exactly the
    // latest-version row per key. Oracle = window dedup over the union.
    "q_upsert" -> ((s, d) => {
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_upsert", java.lang.Integer.toHexString(d.hashCode)).toString
      graft.Exec.deletePath(base) // idempotent across warmup/timed/verify
      val ev = Tables.read(s, d, "events")
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day"),
          expr("ts DIV 1000").as("ver"), col("value"))
      val first = ev.groupBy("user_id", "day")
        .agg(min(col("ver")).as("ver"), round(min(col("value")), 6).as("value"))
      graft.sources.EventSources.upsertByKey(s, base, first,
        Seq("user_id", "day"), "ver", tieBreakCols = Seq("value"))
      val delta = ev.groupBy("user_id", "day")
        .agg(max(col("ver")).as("ver"), round(max(col("value")), 6).as("value"))
        .where(col("user_id") % 2 === 0)
      graft.sources.EventSources.upsertByKey(s, base, delta,
        Seq("user_id", "day"), "ver", tieBreakCols = Seq("value"))
      s.read.parquet(base).select("user_id", "day", "ver", "value")
    }),
    // Fixed-grid resample with forward fill: hourly last-known value per
    // user — irregular events onto a regular feature grid (gap-fill).
    "q_resample" -> ((s, d) => {
      val ev = Tables.read(s, d, "events")
        .where(col("user_id") % 50 === 0)
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("value"))
      Sessions.resampleLastKnown(ev, "user_id", "ts_us", "value",
        step = 3600L * 1000000L)
        .select(col("user_id"), col("bucket"),
          round(col("v_fill"), 6).as("v_fill"), col("observed"))
    }),
    // Bloom-filter semi join: lineitem rows of high-value orders. The bloom
    // pre-filter runs at the scan; the exact semi join removes false
    // positives, so the output equals the plain semi join (the oracle).
    "q_bloom_semi" -> ((s, d) => {
      val li = Tables.read(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val hi = Tables.read(s, d, "orders")
        .where(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"))
      Joins.bloomSemiJoin(li, hi, "l_orderkey", "o_orderkey",
        expectedItems = 100000L, fpp = 0.03)
    }),
    // Z-order layout round-trip: write orders clustered by the Morton code
    // of (custkey, totalprice), box-query the clustered copy. Results are
    // layout-invariant (the oracle reads the original table); the pruning
    // effect itself is asserted in LayoutSpec via scan metrics.
    "q_zorder_scan" -> ((s, d) => {
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_zorder", java.lang.Integer.toHexString(d.hashCode)).toString
      val orders = Tables.read(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      graft.sources.Layout.zorderWrite(orders,
        Seq("o_custkey", "o_totalprice"), base, files = 16)
      s.read.parquet(base)
        .where(col("o_custkey") <= 150L && col("o_totalprice") <= 100000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),
    // Span-level dedup: non-overlapping 10-token chunks occurring in more
    // than one document — the repeated-passage signal used for substring
    // dedup of training corpora.
    "p_chunk_dedup" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val nchunks = floor(size(toks) / 10).cast("int")
      val chunks = when(nchunks >= 1,
        transform(sequence(lit(0), nchunks - 1),
          i => array_join(slice(toks, i * 10 + 1, lit(10)), " ")))
        .otherwise(array().cast("array<string>"))
      Tables.read(s, d, "documents")
        .select(col("doc_id"), explode(chunks).as("chunk"))
        .distinct()
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .where(col("n_docs") > 1)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_asof" ->
      """WITH r0 AS (
        |  SELECT user_id, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'
        |), r AS (SELECT user_id, ts, event_id, value FROM r0 WHERE rn = 1),
        |l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view')
        |SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us,
        |  r.event_id AS click_id, r.value AS click_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "q_range" ->
      """WITH iv AS (
        |  SELECT o_custkey AS cust, max(o_totalprice)*0.99 AS lo,
        |    max(o_totalprice)*1.01 AS hi
        |  FROM orders WHERE o_custkey % 50 = 0 GROUP BY 1
        |), p AS (SELECT o_orderkey, o_totalprice AS price FROM orders)
        |SELECT cust, o_orderkey, price
        |FROM p JOIN iv ON price BETWEEN lo AND hi""".stripMargin,
    "p_sample_hash" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_sql_funcs" ->
      """WITH t AS (SELECT doc_id, n_chars, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |ent AS (
        |  SELECT doc_id, entropy(c) AS e
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
        |        FROM documents)
        |  GROUP BY doc_id
        |)
        |SELECT t.doc_id,
        |  len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    for i in generate_series(1, len(toks)-2)])) AS n_sh,
        |  len(list_distinct([substr(text, i, 5)
        |    for i in generate_series(1, length(text)-4)])) AS n_cs,
        |  round(CAST(n_chars AS DOUBLE) * n_chars, 6) AS sq,
        |  strip_accents(nfc_normalize(substr(text, 1, 12) || ' cafe'
        |    || chr(769))) AS folded,
        |  round(ent.e, 6) AS ent
        |FROM t JOIN ent ON t.doc_id = ent.doc_id""".stripMargin,
    "q_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |),
        |s AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM l
        |)
        |SELECT user_id, session_seq, min(ts_us) AS t_start,
        |  max(ts_us) AS t_end, max(ts_us) - min(ts_us) AS duration,
        |  count(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_upsert" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    epoch_us(ts) AS ver, value
        |  FROM events
        |),
        |firstb AS (
        |  SELECT user_id, day, min(ver) AS ver, round(min(value), 6) AS value
        |  FROM ev GROUP BY 1, 2
        |),
        |delta AS (
        |  SELECT user_id, day, max(ver) AS ver, round(max(value), 6) AS value
        |  FROM ev WHERE user_id % 2 = 0 GROUP BY 1, 2
        |),
        |u AS (SELECT * FROM firstb UNION ALL SELECT * FROM delta),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, day
        |    ORDER BY ver DESC, value DESC) AS rn
        |  FROM u
        |)
        |SELECT user_id, day, ver, value FROM r WHERE rn = 1""".stripMargin,
    "q_resample" ->
      """WITH w AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS b,
        |    epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id % 50 = 0
        |),
        |m AS (SELECT user_id, b, max(ts_us) AS mts FROM w GROUP BY 1, 2),
        |o AS (
        |  SELECT w.user_id, w.b, max(w.value) AS v
        |  FROM w JOIN m ON w.user_id = m.user_id AND w.b = m.b
        |    AND w.ts_us = m.mts
        |  GROUP BY 1, 2
        |),
        |span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM w GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS b FROM span)
        |SELECT g.user_id, g.b AS bucket,
        |  round(last_value(o.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS v_fill,
        |  CASE WHEN o.v IS NULL THEN 0 ELSE 1 END AS observed
        |FROM grid g
        |LEFT JOIN o ON g.user_id = o.user_id AND g.b = o.b""".stripMargin,
    "q_bloom_semi" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)""".stripMargin,
    "q_zorder_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey <= 150 AND o_totalprice <= 100000""".stripMargin,
    "p_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, unnest([array_to_string(toks[i*10+1 : i*10+10], ' ')
        |    for i in generate_series(0, CAST(floor(len(toks)/10) AS INT) - 1)]) AS chunk
        |  FROM t WHERE len(toks) >= 10
        |), d AS (SELECT DISTINCT doc_id, chunk FROM c)
        |SELECT chunk, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM d GROUP BY chunk HAVING count(*) > 1""".stripMargin,
  )
}
