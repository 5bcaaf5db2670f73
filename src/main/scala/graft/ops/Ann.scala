package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>): brute-force cosine top-k as the exact baseline, a
  * random-hyperplane LSH variant and an IVF (coarse-quantizer) variant as the
  * scale paths.
  *
  * Scale design: brute force is a broadcast of the (small) query set against
  * the full corpus — one pass, no shuffle, exact; it is the right plan
  * whenever |queries| is small, at any corpus size. LSH buckets the corpus by
  * signature (shuffle on bucket key) so each query only scans candidate
  * buckets; IVF does the same with learned centroids (nprobe trades recall
  * for cost). Dot products are native `aggregate`/`zip_with` expressions —
  * codegen, no UDFs.
  */
object Ann {

  /** dot(a, b) for two array columns (double math regardless of input type) —
    * a codegen'd native expression, see [[graft.functions.DotProduct]].
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFns.dotNative(a, b)

  def l2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Exact brute-force cosine top-k: broadcast queries × corpus, window rank.
    * Output: (query_id, neighbor_id, rank, cos).
    */
  /** (id, v double[], nrm) — norms computed ONCE per row; every pairwise op
    * divides by the cached norms instead of re-deriving them per pair (an
    * O(pairs·dim) → O(rows·dim) save, the dominant cost of naive pairwise
    * cosine).
    */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      id: String, v: String, nrm: String): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(v))
      // l2 = sqrt(dotNative(v, v)): codegen'd, same summation order as the
      // former HOF fold — bitwise-identical norms
      .withColumn(nrm, l2(col(v)))

  /** `rankOnRoundedTo`: rank on round(cos, d) with neighbor-id tie-break so
    * the ordering is reproducible across engines (oracle parity).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cs = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val qs = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
    val scored = cs.crossJoin(broadcast(qs))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val rankCol = rankOnRoundedTo.map(d => round(col("cos"), d)).getOrElse(col("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(rankCol.desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** All pairs with cosine ≥ threshold — embedding near-dup detection.
    * Exact O(n²) baseline; at corpus scale use [[lshBucketPairs]].
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = withNorm(df, idCol, vecCol, "id1", "v1", "n1")
    val b = withNorm(df, idCol, vecCol, "id2", "v2", "n2")
    a.crossJoin(b).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (dot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Deterministic random hyperplanes: nPlanes × dim, seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection LSH signature (one bit per hyperplane, as a long). */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-table hyperplane-LSH near-dup pairs: `nTables` independent tables
    * of `bitsPerTable` hyperplanes each; a pair is a candidate if it shares a
    * bucket in ANY table; candidates are verified exactly, so precision is
    * 1.0 and recall = 1 − (1 − p^bits)^tables with p = 1 − θ/π.
    *
    * Designed for near-duplicate thresholds (cos ≥ ~0.9): at cos 0.9,
    * 8 tables × 8 bits gives ≈0.96 recall. For weak-similarity thresholds
    * use [[cosinePairs]] (exact) or IVF-style coarse partitioning — hyperplane
    * buckets cannot retrieve far pairs efficiently.
    */
  def lshBucketPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nTables: Int = 8, bitsPerTable: Int = 8,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val base = withNorm(df, idCol, vecCol, "id", "v", "nm")
    val sigs = base.select(col("id"), col("v"), col("nm"),
      explode(array((0 until nTables).map { t =>
        val planes = hyperplanes(bitsPerTable, dim, seed + t)
        xxhash64(lit(t), lshSignature(col("v"), planes))
      }: _*)).as("bucket"))
    val cands = sigs.select(col("bucket"), col("id").as("id1"),
      col("v").as("v1"), col("nm").as("n1"))
      .join(sigs.select(col("bucket"), col("id").as("id2"),
        col("v").as("v2"), col("nm").as("n2")), Seq("bucket"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2", "v1", "v2", "n1", "n2").distinct()
    cands.select(col("id1"), col("id2"),
      (dot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Hyperplane tables as a relational frame (tbl, pid, p ARRAY<DOUBLE>) —
    * the persistence shape for [[lshMultiProbePairs]]'s train-once/scan-many
    * split: write this once and any engine re-derives signatures, probe
    * buckets, and the candidate rule from the parquet alone.
    */
  def lshPlanesDf(spark: org.apache.spark.sql.SparkSession, nTables: Int,
      bitsPerTable: Int, dim: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    (0 until nTables).flatMap { t =>
      hyperplanes(bitsPerTable, dim, seed + t).zipWithIndex.map {
        case (p, i) => (t, i, p)
      }
    }.toDF("tbl", "pid", "p")
  }

  /** Planes persisted via [[lshPlanesDf]] back to the in-memory shape
    * planes(tbl)(pid)(dim) (small by construction: nTables × bits rows).
    */
  def lshPlanesFromDf(df: DataFrame): Seq[Seq[Seq[Double]]] =
    df.select(col("tbl"), col("pid"), col("p").cast("array<double>"))
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
      }

  /** MULTI-PROBE hyperplane-LSH near-dup pairs: a pair is a candidate when
    * its signatures differ in AT MOST ONE bit in some table (probing the
    * `bits` neighboring buckets recovers the recall extra tables would buy,
    * without extra signature state — Lv et al. 2007's observation applied
    * to hyperplane signatures); candidates verify exactly, so precision is
    * 1.0 and recall ≈ 1 − (1 − p^b − b·p^(b−1)(1−p))^T vs the single-probe
    * 1 − (1 − p^b)^T — at cos 0.9, 4 tables × 8 bits goes 0.67 → 0.94.
    *
    * Scale shape: each vector emits `bits + 1` probe keys per table (its
    * own bucket plus one per flipped bit); the join stays key-equi on
    * (tbl, bucket) — candidate volume is governed by bucket occupancy
    * exactly like single-probe, with a (bits+1)× probe-side row factor,
    * NOT an all-pairs blow-up. Signature bits compare on round(dot, 9) so
    * assignment is reproducible across engines given the same planes.
    * Output: (id1, id2, cos) — every multi-probe candidate pair at
    * cos ≥ threshold, a pure function of (data, planes), hash-gateable.
    */
  def lshMultiProbePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Seq[Seq[Seq[Double]]],
      roundTo: Int = 9): DataFrame = {
    val bits = planes.head.length
    val base = withNorm(df, idCol, vecCol, "id", "v", "nm")
    val tables = planes.zipWithIndex.map { case (ps, t) =>
      val sig = ps.zipWithIndex.map { case (p, i) =>
        when(round(dot(col("v"), typedLit(p)), roundTo) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), sig.as("sig"))
    }
    val sigs = base
      .select(col("id"), explode(array(tables: _*)).as("ts"))
      .select(col("id"), col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
    val probeCols = col("sig") +:
      (0 until bits).map(i => col("sig").bitwiseXOR(lit(1L << i)))
    val probes = sigs.select(col("id").as("id1"), col("tbl"),
      explode(array(probeCols: _*)).as("sig"))
    val cands = probes
      .join(sigs.select(col("tbl"), col("sig"), col("id").as("id2")),
        Seq("tbl", "sig"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val a = withNorm(df, idCol, vecCol, "id1", "v1", "n1")
    val b = withNorm(df, idCol, vecCol, "id2", "v2", "n2")
    cands.join(a, Seq("id1")).join(b, Seq("id2"))
      .select(col("id1"), col("id2"),
        (dot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, q_i =
    * floor(x_i/scale + 0.5) ∈ [-127, 127] stored as ARRAY<TINYINT> — 4-8×
    * smaller at rest and on the shuffle wire than the float/double original,
    * the standard memory lever for billion-vector ANN. floor(x + 0.5) (not
    * round()) keeps the tie rule identical across engines, so the result is
    * bit-reproducible anywhere. Cosine over quantized vectors needs no
    * dequantization: the per-vector scales cancel in q·q/(|q||q|).
    * Output: (id, scale, qv).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col("__v")
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("scale",
        greatest(array_max(transform(v, x => abs(x))), lit(1e-30)) / 127.0)
      .select(col("id"), col("scale"),
        transform(v, x => floor(x / col("scale") + 0.5).cast("tinyint")).as("qv"))
  }

  /** Brute-force cosine top-k over int8-quantized vectors: same output shape
    * as [[bruteTopK]] but every pairwise op runs on the 8-bit payload
    * (cast to double lane-wise inside codegen; scales cancel in cosine).
    * Approximation error is the quantization error only (~1/254 per lane).
    */
  def bruteTopKInt8(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def prep(df: DataFrame, id: String, v: String, nrm: String): DataFrame =
      quantizeInt8(df, idCol, vecCol)
        .select(col("id").as(id), col("qv").cast("array<double>").as(v))
        .withColumn(nrm, sqrt(dot(col(v), col(v))))
    val cs = prep(corpus, "neighbor_id", "cv", "cn")
    val qs = prep(queries, "query_id", "qv", "qn")
    val scored = cs.crossJoin(broadcast(qs))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Product-quantization codebooks: the embedding dimension is split into
    * `m` disjoint subspaces and each subspace gets its own `k`-centroid
    * codebook, trained by seeded Lloyd iterations on a DRIVER-SIDE sample —
    * PQ codebooks are sample-trained by design (FAISS trains on ≤ a few
    * hundred thousand vectors regardless of corpus size), so the train step
    * costs one bounded collect at any corpus scale.
    * Returns codebooks(m)(k)(dim/m).
    */
  def pqTrain(corpus: DataFrame, vecCol: String, m: Int, k: Int,
      sampleN: Int = 10000, iters: Int = 10,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    // deterministic sample: order by a value hash so the trained codebooks
    // (and hence the ADC shortlist) don't depend on partition layout/scan
    // order — xxhash64 over the vector is a pseudo-random but reproducible
    // key, and limit-after-sort plans as TakeOrderedAndProject (top-N per
    // partition, no full sort) at any corpus scale
    val sample = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("v")), col("v"))
      .limit(sampleN).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pqTrain: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val rnd = new scala.util.Random(seed)
    Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // seeded init from distinct sample points; classic Lloyd
      var cents = rnd.shuffle(sub.toSeq).take(k).map(_.clone()).toArray
      while (cents.length < k) cents :+= sub(rnd.nextInt(sub.length)).clone()
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        sub.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until k) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
        }
        for (c <- 0 until k if counts(c) > 0; i <- 0 until dsub)
          cents(c)(i) = sums(c)(i) / counts(c)
      }
      cents
    }
  }

  /** Codebooks as a relational frame (subspace, cid, c, n2 = |c|²) — the
    * persistence shape for [[pqTopK]]'s train-once/scan-many split: write
    * this once, and any engine (this one or an external SQL verifier) can
    * re-derive codes, ADC tables, and shortlists from the parquet alone.
    */
  def pqCodebookDf(spark: org.apache.spark.sql.SparkSession,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, cid) =>
        (j, cid, c.toSeq, c.map(x => x * x).sum)
      }
    }.toSeq.toDF("subspace", "cid", "c", "n2")
  }

  /** Read codebooks persisted via [[pqCodebookDf]] back into the in-memory
    * train shape (small by construction: m × k rows).
    */
  def pqCodebookFromDf(df: DataFrame): Array[Array[Array[Double]]] =
    df.select(col("subspace"), col("cid"), col("c").cast("array<double>"))
      .collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }

  /** PQ-encode: (id, codes ARRAY<INT> length m, rn2 = |reconstruction|²).
    * The per-row m·k·(dim/m) fused multiply-adds run in the codegen'd
    * [[graft.functions.PqEncodeExpr]] loop (the codebook rides as a plan
    * reference object), then the 4-byte-per-subspace code is all that ever
    * reaches state or the wire (dim/m × compression). rn2 is exact for the
    * reconstruction because subspaces are disjoint coordinates:
    * |x̂|² = Σ_j |cb_j[code_j]|².
    *
    * `assignOnRoundedTo`: rank centroids on round(|c|² − 2·v·c, d) so the
    * argmin (and hence the code) is reproducible bit-for-bit across engines
    * whose float summation order differs (oracle parity); ties break to the
    * lowest centroid id on every engine.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      assignOnRoundedTo: Option[Int] = None): DataFrame = {
    val m = codebooks.length
    val cbN2 = typedLit(codebooks.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
    df.select(col(idCol).as("id"),
        graft.functions.VectorFns.pqEncodeNative(col(vecCol), codebooks,
          assignOnRoundedTo.getOrElse(-1)).as("codes"))
      .withColumn("rn2", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)), (c, j) =>
          element_at(element_at(cbN2, j + 1), c + 1)), lit(0.0), (a, x) => a + x))
  }

  /** HOF reference form of [[pqEncode]] (semantically identical; OpsSpec
    * asserts equality) — kept because the `transform`/`array_min` rendering
    * is the portable SQL documentation of the argmin contract.
    */
  def pqEncodeHof(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      assignOnRoundedTo: Option[Int] = None): DataFrame = {
    val m = codebooks.length
    val k = codebooks.head.length
    val dsub = codebooks.head.head.length
    val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val cbN2 = typedLit(codebooks.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
    val v = col("__v")
    def subv(j: Column) = slice(v, j * dsub + 1, lit(dsub))
    val codes = transform(sequence(lit(0), lit(m - 1)), j => {
      val cb = element_at(cbLit, j + 1)
      // rank centroids by |c|² − 2·v_j·c (v_j² constant per row);
      // array_position of the min tie-breaks on the FIRST (lowest-id)
      // centroid — deterministic
      val scored = transform(sequence(lit(0), lit(k - 1)), c => {
        val d = element_at(element_at(cbN2, j + 1), c + 1) -
          dot(subv(j), element_at(cb, c + 1)) * 2
        assignOnRoundedTo.map(p => round(d, p)).getOrElse(d)
      })
      (array_position(scored, array_min(scored)) - 1).cast("int")
    })
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("id"), codes.as("codes"))
      .withColumn("rn2", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)), (c, j) =>
          element_at(element_at(cbN2, j + 1), c + 1)), lit(0.0), (a, x) => a + x))
  }

  /** PQ top-k via asymmetric distance (ADC) + exact rerank: each query
    * builds ONE m×k inner-product lookup table against the codebooks;
    * scoring a corpus row is then m table lookups + adds over its codes —
    * never touching the original vectors. The ADC pass keeps a
    * `rerank`·k shortlist per query, whose ORIGINAL vectors (that tiny
    * semi-joined subset only) are scored exactly for the final ranking —
    * the standard IVF/PQ serving shape: compressed codes bound the scan
    * cost, the exact pass restores precision on the shortlist.
    * Output: (query_id, neighbor_id, rank, cos) — cos is exact.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, kcent: Int = 32,
      rerank: Int = 4, codebooksOpt: Option[Array[Array[Array[Double]]]] = None,
      seed: Long = 42L, rankOnRoundedTo: Option[Int] = None,
      codesOpt: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = codebooksOpt.getOrElse(pqTrain(corpus, vecCol, m, kcent, seed = seed))
    val kc = cb.head.length
    val dsub = cb.head.head.length
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    def rnd(c: Column): Column =
      rankOnRoundedTo.map(p => round(c, p)).getOrElse(c)
    // codesOpt: a serving deployment encodes the corpus ONCE (pqEncode →
    // parquet) and every query batch scans the persisted (id, codes, rn2) —
    // pass that frame here to skip re-encoding per call
    val codes = codesOpt.getOrElse(pqEncode(corpus, idCol, vecCol, cb, rankOnRoundedTo))
      .select(col("id").as("neighbor_id"), col("codes"), sqrt(col("rn2")).as("cn"))
    val qv = col("__q")
    val table = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(kc - 1)), c =>
        dot(slice(qv, j * dsub + 1, lit(dsub)),
          element_at(element_at(cbLit, j + 1), c + 1))))
    val qs = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__q"))
      .withColumn("qn", sqrt(dot(qv, qv)))
      .select(col("query_id"), col("qn"), table.as("t"))
    val adc = codes.crossJoin(broadcast(qs))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VectorFns.adcNative(col("codes"), col("t")) /
          (col("qn") * col("cn"))).as("adc"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(rnd(col("adc")).desc, col("neighbor_id"))
    val shortlist = adc.withColumn("__r", row_number().over(wAdc))
      .where(col("__r") <= k * rerank)
      .select("query_id", "neighbor_id")
    // exact pass over the shortlist only: original vectors are semi-joined
    // in, never scanned corpus-wide
    val cvs = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val qvs = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
    val exact = shortlist
      .join(cvs, Seq("neighbor_id"))
      .join(broadcast(qvs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF-PQ composed search — the standard billion-vector serving index
    * (coarse quantizer bounds WHICH rows are scored, PQ codes bound WHAT
    * each scoring costs): assign the corpus to nearest-centroid cells and
    * PQ-encode it ONCE (both artifacts persist; pass `indexOpt` to scan a
    * prebuilt (id, cell, codes, rn2) frame), then per query probe the
    * `nprobe` nearest cells, ADC-score only the probed cells' codes, keep
    * a `rerank`·k shortlist, and score the shortlist's ORIGINAL vectors
    * exactly. Cell pruning multiplies with the dim/m code compression:
    * the ADC pass reads nprobe/nlist of the corpus at m bytes per row.
    * Output: (query_id, neighbor_id, rank, cos) — cos exact.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], nprobe: Int = 4,
      rerank: Int = 4, rankOnRoundedTo: Option[Int] = None,
      indexOpt: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    val kc = codebooks.head.length
    val dsub = codebooks.head.head.length
    val nCells = cents.length
    val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val centArr = typedLit(cents.map(_.toSeq).toSeq)
    def rnd(c: Column): Column =
      rankOnRoundedTo.map(p => round(c, p)).getOrElse(c)
    val index = indexOpt.getOrElse {
      val asn = corpus
        .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
        .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
          col("__v"), cents, rankOnRoundedTo.getOrElse(-1)))
      asn.select(col("id"), col("cell"))
        .join(pqEncode(corpus, idCol, vecCol, codebooks, rankOnRoundedTo),
          Seq("id"))
    }
    val codes = index.select(col("id").as("neighbor_id"), col("cell"),
      col("codes"), sqrt(col("rn2")).as("cn"))
    // per-query probe list (same |c|²−2·v·c ranking as the index build)
    // and ADC lookup table, built once per query
    val qv = col("__q")
    def nearest(vec: Column, n: Int): Column = {
      val scored = transform(sequence(lit(0), lit(nCells - 1)), i => {
        val cent = element_at(centArr, i + 1)
        struct(rnd(dot(cent, cent) - dot(vec, cent) * 2).as("d"), i.as("cid"))
      })
      slice(transform(array_sort(scored), s => s.getField("cid")), 1, n)
    }
    val table = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(kc - 1)), c =>
        dot(slice(qv, j * dsub + 1, lit(dsub)),
          element_at(element_at(cbLit, j + 1), c + 1))))
    val qs = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__q"))
      .withColumn("qn", sqrt(dot(qv, qv)))
      .select(col("query_id"), col("qn"), table.as("t"),
        explode(nearest(col("__q"), nprobe)).as("cell"))
    // key-equi join on the probed cell: at scale this is a partition-pruned
    // scan of the cell-partitioned code index, not a full-corpus pass
    val adc = codes.join(broadcast(qs), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VectorFns.adcNative(col("codes"), col("t")) /
          (col("qn") * col("cn"))).as("adc"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(rnd(col("adc")).desc, col("neighbor_id"))
    val shortlist = adc.withColumn("__r", row_number().over(wAdc))
      .where(col("__r") <= k * rerank)
      .select("query_id", "neighbor_id")
    val cvs = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val qvs = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
    val exact = shortlist
      .join(cvs, Seq("neighbor_id"))
      .join(broadcast(qvs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Train the IVF coarse quantizer alone: seeded bounded-iteration KMeans,
    * returned as (cid, c ARRAY<DOUBLE>) — the persistence shape for the
    * train-once/scan-many split (write this once; scans and external SQL
    * verifiers re-derive cell assignment from the parquet alone).
    */
  /** [[ivfTrain]] with nlist picked FROM the corpus: ⌈N / targetPerCell⌉
    * clamped to [2, maxNlist] — the IVF sizing rule as code. A quantizer
    * whose cell count is pinned while the corpus grows makes every
    * within-cell pairwise op (SemDeDup, kNN graph) quadratic; sizing
    * cells to a bounded occupancy keeps them linear (measured:
    * tools/probe_r9_new_sf1.log, 70.7s → 3.6s at 10× data). Returns
    * (centroids frame, chosen nlist) so callers can persist both.
    */
  def ivfTrainSized(corpus: DataFrame, vecCol: String,
      targetPerCell: Int = 256, maxNlist: Int = 65536, seed: Long = 42L,
      kmeansIter: Int = 8): (DataFrame, Int) = {
    require(targetPerCell >= 1, "targetPerCell must be >= 1")
    val n = corpus.count()
    if (n < 2) return (degenerateCentroids(corpus, vecCol), math.max(1, n.toInt))
    // upper clamp at N: KMeans cannot place more centroids than points
    val nlist = math.min(math.min(maxNlist.toLong, n),
      math.max(2L, (n + targetPerCell - 1) / targetPerCell)).toInt
    (ivfTrain(corpus, vecCol, nlist, seed, kmeansIter), nlist)
  }

  /** [[ivfTrainSized]] with the √N balance instead of fixed occupancy:
    * nlist = c·⌈√N⌉ clamped. Bounded-occupancy sizing (nlist ∝ N) keeps
    * in-cell work flat but makes flat-quantizer ASSIGNMENT O(N·nlist) =
    * O(N²/target) — fine through ~10⁷ vectors, quadratic past it. The
    * √N rule equalizes the two costs (assignment and in-cell scan both
    * O(N^1.5·dim), the FAISS guidance of nlist ≈ 4√N..16√N), which is
    * the right quantizer for the billion-vector regime.
    *
    * TRAINING stays bounded under the √N law by [[ivfTrain]]'s sample
    * ceiling (FAISS's max_points_per_centroid budget, hard-capped at
    * `maxTrainN`): once the corpus passes the ceiling, each KMeans
    * iteration is a fixed-size pass and total training cost grows only
    * with nlist — O(√N) — while assignment/scan stay the O(N^1.5)
    * balance point. Below the ceiling the fit sees the whole corpus
    * (more data than FAISS practice needs, but free at that scale).
    */
  def ivfTrainBalanced(corpus: DataFrame, vecCol: String,
      cellsPerSqrtN: Int = 4, maxNlist: Int = 262144, seed: Long = 42L,
      kmeansIter: Int = 8, maxTrainN: Int = 262144): (DataFrame, Int) = {
    require(cellsPerSqrtN >= 1, "cellsPerSqrtN must be >= 1")
    val n = corpus.count()
    if (n < 2) return (degenerateCentroids(corpus, vecCol), math.max(1, n.toInt))
    // upper clamp at N: KMeans cannot place more centroids than points
    val nlist = math.min(math.min(maxNlist.toLong, n),
      math.max(2L,
        cellsPerSqrtN * math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    (ivfTrain(corpus, vecCol, nlist, seed, kmeansIter,
      maxTrainN = maxTrainN), nlist)
  }

  /** Sub-2-point corpus: the points themselves are the quantizer (Spark
    * KMeans requires k >= 2 and k <= |points|). An empty corpus yields an
    * all-zero single centroid so downstream assignment stays total.
    */
  private def degenerateCentroids(corpus: DataFrame, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pts = corpus.select(col(vecCol).cast("array<double>").as("c"))
      .limit(1).collect()
    if (pts.isEmpty) Seq((0, Seq(0.0))).toDF("cid", "c")
    else Seq((0, pts.head.getSeq[Double](0))).toDF("cid", "c")
  }

  def ivfTrain(corpus: DataFrame, vecCol: String, nlist: Int = 16,
      seed: Long = 42L, kmeansIter: Int = 8,
      sampleN: Int = 0, trainPerCell: Int = 256,
      maxTrainN: Int = 262144): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    // A coarse quantizer does not need converged clustering over the full
    // corpus — recall comes from nprobe, not centroid quality — so the fit
    // runs on a bounded DETERMINISTIC sample (value-hash order, the same
    // contract as pqTrain's sample: layout-independent), making each KMeans
    // iteration a fixed-size pass regardless of corpus scale; bounded
    // iterations + seeded random init keep cell assignment deterministic.
    //
    // sampleN <= 0 → the FAISS training-budget rule: ~256 points per
    // centroid (faiss max_points_per_centroid) — beyond that, extra
    // points buy cost, not recall (recall comes from nprobe). The budget
    // GROWS with nlist (floored at nlist so k <= points always holds)
    // but is HARD-CAPPED at maxTrainN: past the cap each KMeans
    // iteration is a fixed-size pass and training cost is
    // O(maxTrainN·nlist·iter·dim) — under the √N law that grows only
    // O(√N), keeping quantizer training strictly sublinear while
    // assignment/scan carry the O(N^1.5) balance. (Uncapped 256·nlist
    // growth would make training itself the dominant linear-cost stage
    // of every index build; a fixed-size sample with no nlist floor
    // instead breaks outright once nlist exceeds the sample — KMeans
    // k > training points — exactly the billion-vector regime
    // ivfTrainBalanced exists for.)
    // floor of 4 training points per centroid: at the cap extreme
    // (nlist → maxTrainN) the budget would otherwise collapse to exactly
    // nlist — one point per centroid, a degenerate fit where the
    // "centroids" are just the sample. The floor RAISES the cap in that
    // regime (cost still O(nlist), i.e. O(√N) under the √N law) so the
    // fit always averages ≥4 points per cell.
    val budget = if (sampleN > 0) sampleN
      else math.max(4L * nlist,
        math.min(maxTrainN.toLong, trainPerCell.toLong * nlist)).toInt
    val sample = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("v")), col("v"))
      .limit(budget)
      // TakeOrderedAndProject leaves the sample in ONE partition; spread it
      // back out or every KMeans pass runs on a single core
      .repartition(spark.sparkContext.defaultParallelism)
    // cached for the fit's duration: each KMeans iteration re-reads the
    // training frame, and without the cache that re-runs the sample's
    // sort-limit lineage per pass
    val train = sample.select(array_to_vector(col("v")).as("features")).cache()
    try {
      val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
        .setMaxIter(kmeansIter).setInitMode("random")
      km.fit(train).clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq.toDF("cid", "c")
    } finally train.unpersist()
  }

  /** Centroids persisted via [[ivfTrain]] back to the in-memory shape,
    * ordered by cid (small by construction: nlist rows).
    */
  def ivfCentroidsFromDf(df: DataFrame): Array[Array[Double]] =
    df.select(col("cid"), col("c").cast("array<double>")).collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  /** IVF top-k: KMeans coarse quantizer (seeded, or fixed pre-trained
    * centroids), assign corpus to nearest centroid, probe `nprobe` centroids
    * per query, exact rerank inside probed cells.
    * Output: (query_id, neighbor_id, rank, cos).
    *
    * `rankOnRoundedTo`: rank cell assignment and the final cosine on values
    * rounded to d decimals (lowest-cid / lowest-neighbor tie-breaks), so the
    * full scan stage is reproducible across engines given the same centroids.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L, kmeansIter: Int = 8,
      centroidsOpt: Option[Array[Array[Double]]] = None,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    val cents = centroidsOpt.getOrElse(
      ivfCentroidsFromDf(ivfTrain(corpus, vecCol, nlist, seed, kmeansIter)))
    // corpus cell assignment is the codegen'd NearestCellExpr loop
    // (nCells·dim FMAs per row, no interpreted HOF) — the corpus-side cost
    // of building the inverted file
    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
        col(vecCol).cast("array<double>"), cents,
        rankOnRoundedTo.getOrElse(-1)))
    ivfSearchAssigned(assigned, queries, idCol, vecCol, k, nprobe, cents,
      rankOnRoundedTo)
  }

  /** All-pairs top-k neighbor GRAPH over the corpus — the artifact
    * SemDeDup-style pruning, graph-based diversity sampling, and kNN
    * classification all consume. Unlike [[ivfSearchAssigned]] (few queries,
    * broadcast), here the query side IS the corpus: both sides shuffle on
    * the cell key (one co-partitioned join, cost Σ|cell|·|probes into it|),
    * and probing runs in the codegen'd per-row loop
    * ([[graft.functions.NearestCellsExpr]]) rather than a per-row HOF sort.
    * Cell-size skew is AQE's skew-join case; nlist should grow with the
    * corpus so per-cell work stays bounded (the IVF cost model).
    */
  def knnGraph(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      cents: Array[Array[Double]], nprobe: Int = 2,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    val rs = rankOnRoundedTo.getOrElse(-1)
    knnGraphAssigned(
      emb.select(col(idCol), col(vecCol).cast("array<double>").as("__kv"))
        .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
          col("__kv"), cents, rs)),
      idCol, "__kv", k, cents, nprobe, rankOnRoundedTo)
  }

  /** [[knnGraph]] over an ALREADY-ASSIGNED frame (idCol, vecCol
    * ARRAY<DOUBLE>, cell) — the corpus side trusts the stored cell, so a
    * persistent inverted file (the streaming index of
    * [[graft.streaming.AnnIndexMaintainer]]) can derive the neighbor
    * graph without re-assigning the corpus; only query-side probing
    * recomputes, in the codegen'd loop.
    */
  def knnGraphAssigned(assigned: DataFrame, idCol: String, vecCol: String,
      k: Int, cents: Array[Array[Double]], nprobe: Int = 2,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rs = rankOnRoundedTo.getOrElse(-1)
    def rnd(c: Column): Column =
      rankOnRoundedTo.map(p => round(c, p)).getOrElse(c)
    val base = assigned.select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"), col("cell"))
      .withColumn("__n",
        sqrt(graft.functions.VectorFns.dotNative(col("__v"), col("__v"))))
    val cs = base.select(col(idCol).as("neighbor_id"), col("__v").as("cv"),
      col("__n").as("cn"), col("cell"))
    val qs = base.select(col(idCol).as("query_id"), col("__v").as("qv"),
        col("__n").as("qn"))
      .withColumn("cell", explode(graft.functions.VectorFns
        .nearestCellsNative(col("qv"), cents, rs, nprobe)))
    val scored = cs.join(qs, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VectorFns.dotNative(col("qv"), col("cv")) /
          (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * query, the k nearest corpus vectors carrying a DIFFERENT label
    * (the "hard" negatives a metric-learning batch wants next to its
    * positives). Exact baseline with broadcast queries (the
    * [[bruteTopK]] shape); at corpus-as-queries scale use
    * [[hardNegativesGraph]], which shuffles both sides on the cell key.
    * Returns (query_id, neighbor_id, neg_label, rank, cos).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cs = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("neg_label")), Seq("neighbor_id"))
    val qs = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
      .join(queries.select(col(idCol).as("query_id"),
        col(labelCol).as("__ql")), Seq("query_id"))
    val scored = cs.crossJoin(broadcast(qs))
      .where(col("query_id") =!= col("neighbor_id") &&
        col("neg_label") =!= col("__ql"))
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val rankCol = rankOnRoundedTo.map(d => round(col("cos"), d))
      .getOrElse(col("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(rankCol.desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "neg_label", "rank", "cos")
  }

  /** [[hardNegatives]] at corpus scale — the [[knnGraphAssigned]] shape
    * with the different-label filter applied BEFORE ranking: every vector
    * mines its k nearest different-label neighbors among its nprobe
    * nearest cells. Both sides shuffle on the cell key (no broadcast —
    * the query side IS the corpus), so mining batch-construction
    * negatives for the whole training set costs one co-partitioned join,
    * exactly the graph build. Returns (query_id, neighbor_id, neg_label,
    * rank, cos).
    */
  def hardNegativesGraph(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, cents: Array[Array[Double]],
      nprobe: Int = 2, rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rnd(c: Column): Column =
      rankOnRoundedTo.map(p => round(c, p)).getOrElse(c)
    val scored = hardNegScored(emb, idCol, vecCol, labelCol, cents, nprobe,
      rankOnRoundedTo)
    val w = Window.partitionBy("query_id")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "neg_label", "rank", "cos")
  }

  /** [[hardNegativesGraph]] with PER-LABEL quotas — balanced contrastive
    * batches: each query keeps at most `perLabel` negatives from any one
    * label before the final top-k, so one adjacent class cannot crowd out
    * the rest of the batch. Returns (query_id, neighbor_id, neg_label,
    * rank, cos).
    */
  def hardNegativesGraphBalanced(emb: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, perLabel: Int,
      cents: Array[Array[Double]], nprobe: Int = 2,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(perLabel >= 1, "perLabel must be >= 1")
    def rnd(c: Column): Column =
      rankOnRoundedTo.map(p => round(c, p)).getOrElse(c)
    val scored = hardNegScored(emb, idCol, vecCol, labelCol, cents, nprobe,
      rankOnRoundedTo)
    val wl = Window.partitionBy("query_id", "neg_label")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("__lr", row_number().over(wl))
      .where(col("__lr") <= perLabel)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "neg_label", "rank", "cos")
  }

  /** The shared candidate-scoring stage of the graph miners: both sides
    * shuffle on the cell key, different-label filter BEFORE any ranking.
    */
  private def hardNegScored(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, cents: Array[Array[Double]], nprobe: Int,
      rankOnRoundedTo: Option[Int]): DataFrame = {
    val rs = rankOnRoundedTo.getOrElse(-1)
    val base = emb.select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"), col(labelCol).as("__l"))
      .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
        col("__v"), cents, rs))
      .withColumn("__n",
        sqrt(graft.functions.VectorFns.dotNative(col("__v"), col("__v"))))
    val cs = base.select(col(idCol).as("neighbor_id"), col("__v").as("cv"),
      col("__n").as("cn"), col("__l").as("neg_label"), col("cell"))
    val qs = base.select(col(idCol).as("query_id"), col("__v").as("qv"),
        col("__n").as("qn"), col("__l").as("__ql"))
      .withColumn("cell", explode(graft.functions.VectorFns
        .nearestCellsNative(col("qv"), cents, rs, nprobe)))
    cs.join(qs, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id") &&
        col("neg_label") =!= col("__ql"))
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        (graft.functions.VectorFns.dotNative(col("qv"), col("cv")) /
          (col("qn") * col("cn"))).as("cos"))
  }

  /** kNN classification by majority vote over the k nearest neighbors —
    * the label-propagation / weak-labeling op (ties break toward the
    * smallest label, so the prediction is engine-reproducible).
    * Returns (query_id, pred_label, votes).
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nn = bruteTopK(corpus, queries, idCol, vecCol, k, rankOnRoundedTo)
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__l")), Seq("neighbor_id"))
    val votes = nn.groupBy(col("query_id"), col("__l"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("__l"))
    votes.withColumn("__r", row_number().over(w)).where(col("__r") === 1)
      .select(col("query_id"), col("__l").as("pred_label"), col("votes"))
  }

  /** Pair-set recall of an approximate near-dup result against the exact
    * one — the [[recallAtK]] audit for PAIR ops (LSH families): fraction
    * of true pairs the approximate pass found. Inputs are (id1, id2)
    * frames with id1 < id2; one row out.
    */
  def pairRecall(found: DataFrame, exact: DataFrame): DataFrame = {
    val f = found.select(col("id1"), col("id2"))
    val e = exact.select(col("id1"), col("id2"))
    val hits = e.join(f, Seq("id1", "id2"), "semi")
    e.agg(count(lit(1)).as("n_true"))
      .crossJoin(f.agg(count(lit(1)).as("n_found")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(col("n_true"), col("n_found"), col("n_hits"),
        // empty true-pair set → recall is vacuously 1.0, not 0/0 = null
        coalesce(round(col("n_hits") / col("n_true"), 6), lit(1.0))
          .as("recall"))
  }

  /** Recall@k of an approximate result against the exact one — the audit a
    * pipeline owner runs to pick (nlist, nprobe, m): fraction of exact
    * top-k edges the approximate search found. Both inputs are
    * (query_id, neighbor_id, rank, …) frames; one row out.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.where(col("rank") <= k).select("query_id", "neighbor_id")
    val e = exact.where(col("rank") <= k).select("query_id", "neighbor_id")
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "semi")
    e.agg(count(lit(1)).as("__n")).crossJoin(
        hits.agg(count(lit(1)).as("n_hits")))
      .select(col("__n").as("n_exact"), col("n_hits"),
        // empty exact set → recall is vacuously 1.0, not 0/0 = null
        coalesce(round(col("n_hits") / col("__n"), 6), lit(1.0))
          .as("recall"))
  }

  /** Per-key elementwise mean vectors — the class-centroid op (label
    * centroids for classification heads, seed centroids for IVF, cluster
    * summaries for diversity sampling). One shuffle on (key, dim-index),
    * then per-key repack in index order; no vector is ever collected.
    */
  def meanVectors(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol).as("key"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
      .groupBy("key", "i").agg(avg(col("v")).as("m"))
      .groupBy("key")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("centroid"))
      .withColumnRenamed("key", keyCol)

  /** Semantic deduplication — SemDeDup (Abbas et al. 2023), the
    * embedding-space near-duplicate pruning step of large-scale curation:
    * assign every vector to its nearest centroid (the same coarse
    * quantizer the IVF index trains), then WITHIN each cluster drop any
    * vector that has an earlier (lower-id) cluster-mate with cosine ≥
    * `tau`. The all-pairs comparison is confined to a cluster — the
    * published cost model: cluster count grows with the corpus while
    * per-cluster work stays bounded, so no global pairwise join ever runs.
    *
    * Keep rule ("earlier near-neighbor exists ⇒ drop") is a pure pairwise
    * predicate — deterministic, order-free, and SQL-expressible — rather
    * than a sequential greedy scan, so the kept set is reproducible by
    * the DuckDB oracle. Cosines and cell assignment compare on values
    * rounded to `roundTo` (lowest-cid tie-break) for cross-engine
    * stability. Returns the KEPT rows as (idCol, cell).
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], tau: Double,
      roundTo: Int = 6): DataFrame =
    semDedupAssigned(
      emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
        .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
          col("__v"), cents, roundTo)),
      idCol, tau, roundTo)

  /** [[semDedup]]'s pruning stage over an ALREADY-ASSIGNED frame
    * (idCol, __v ARRAY<DOUBLE>, cell) — split out so a persistent
    * cell-assigned index (the streaming inverted file) can derive the
    * kept set without re-assigning the corpus.
    */
  def semDedupAssigned(asnIn: DataFrame, idCol: String, tau: Double,
      roundTo: Int = 6): DataFrame = {
    val asn = asnIn.withColumn("__n", l2(col("__v")))
    val a = asn.select(col("cell"), col(idCol).as("__id1"),
      col("__v").as("__v1"), col("__n").as("__n1"))
    val b = asn.select(col("cell"), col(idCol).as("__id2"),
      col("__v").as("__v2"), col("__n").as("__n2"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("__id1") < col("__id2") &&
        round(graft.functions.VectorFns.dotNative(col("__v1"), col("__v2")) /
          (col("__n1") * col("__n2")), roundTo) >= tau)
      .select(col("__id2").as(idCol)).distinct()
    asn.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** PQ-coded SemDeDup — the billion-vector scale path for [[semDedup]]:
    * within-cell pair screening runs on m-byte PQ codes instead of the
    * raw vectors, so the quadratic-in-cell-size stage shuffles and
    * compares dim/m× less data; only pairs the code-level screen flags
    * fetch their ORIGINAL vectors for the exact keep/drop test.
    *
    * The screen is SYMMETRIC distance (SDC): dot(â, b̂) =
    * Σ_j dot(cb_j[code_a_j], cb_j[code_b_j]) — a per-subspace k×k
    * centroid-dot lookup table (m·k² doubles, plan-embedded), m lookups +
    * adds per pair. Screened cosine = sdc / (|â|·|b̂|), compared against
    * `tau − margin`: margin absorbs quantization error, trading screen
    * volume for recall exactly like [[pqTopK]]'s `rerank` factor. A pair
    * the screen misses is lost (documented approximation — the spec
    * measures recall vs [[semDedup]]); a screened pair never drops
    * wrongly, because the final predicate re-checks the EXACT cosine.
    *
    * Same artifact contract as [[semDedup]] + [[pqTopK]]: (centroids,
    * codebooks) persist once and the kept set is a pure function of
    * (data, centroids, codebooks, tau, margin) — hash-gateable. Returns
    * kept (idCol, cell).
    */
  def semDedupPq(emb: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      tau: Double, margin: Double = 0.2, roundTo: Int = 6): DataFrame = {
    val m = codebooks.length
    val sdc: Seq[Seq[Seq[Double]]] = codebooks.map { cb =>
      cb.map(c1 => cb.map(c2 =>
        c1.zip(c2).map { case (a, b) => a * b }.sum).toSeq).toSeq
    }.toSeq
    val asn = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cell", graft.functions.VectorFns.nearestCellNative(
        col("__v"), cents, roundTo))
    val coded = pqEncode(asn, idCol, "__v", codebooks, Some(roundTo))
      .withColumnRenamed("id", idCol)
    val keyed = asn.select(col(idCol), col("cell"))
      .join(coded, Seq(idCol))
      .withColumn("__rn", sqrt(col("rn2")))
    // the pair join carries (id, codes, |x̂|) ONLY — m ints + one double
    // per row, never the vectors
    val a = keyed.select(col("cell"), col(idCol).as("__id1"),
      col("codes").as("__c1"), col("__rn").as("__rn1"))
    val b = keyed.select(col("cell"), col(idCol).as("__id2"),
      col("codes").as("__c2"), col("__rn").as("__rn2"))
    // codegen'd lookup-sum (same j-ascending summation as the HOF form it
    // replaced, so rounded screen values are identical) — at corpus scale
    // the screen runs once per candidate PAIR, and an interpreted
    // nested-element_at walk there cost more than the full-vector dot it
    // was supposed to avoid (round-9 probe: 37× at 10× data, fixed here)
    val sdcDot = graft.functions.VectorFns.sdcNative(
      col("__c1"), col("__c2"), sdc)
    val screened = a.join(b, Seq("cell"))
      .where(col("__id1") < col("__id2"))
      .where(round(sdcDot / (col("__rn1") * col("__rn2")), roundTo) >=
        tau - margin)
      .select(col("__id1"), col("__id2"))
    // survivors (tiny by construction) fetch original vectors for the
    // exact drop test
    val vecs = asn.withColumn("__n", l2(col("__v")))
    val dropped = screened
      .join(vecs.select(col(idCol).as("__id1"), col("__v").as("__v1"),
        col("__n").as("__n1")), Seq("__id1"))
      .join(vecs.select(col(idCol).as("__id2"), col("__v").as("__v2"),
        col("__n").as("__n2")), Seq("__id2"))
      .where(round(dot(col("__v1"), col("__v2")) /
        (col("__n1") * col("__n2")), roundTo) >= tau)
      .select(col("__id2").as(idCol)).distinct()
    asn.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** Cluster-balanced diversity sampling — the D4-style counterpart of
    * [[semDedup]] (Tirumala et al. 2023): cap each embedding cluster at
    * `perCell` rows, picked in the engine-portable (md5(id), id) order
    * ([[Sampling.capPerKey]]'s determinism rule), so over-represented
    * semantic regions are down-weighted instead of the corpus being
    * sampled uniformly. Same persisted-coarse-quantizer contract as
    * [[semDedup]]; one shuffle on the cell key; returns kept (idCol, cell).
    */
  def clusterSample(emb: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], perCell: Int,
      roundTo: Int = 6): DataFrame = {
    val asn = emb.select(col(idCol),
        graft.functions.VectorFns.nearestCellNative(
          col(vecCol).cast("array<double>"), cents, roundTo).as("cell"))
    Sampling.capPerKey(asn, "cell", idCol, perCell)
  }

  /** Driver-side mirror of the query-probe ranking: the `nprobe` nearest
    * cells of one vector, ordered by (squared euclidean distance, cid) —
    * the same |c|² − 2·v·c form the SQL probe uses, so both sides pick
    * identical cells. Lets a serving layer compute probe lists locally and
    * push a static `cell IN (...)` partition filter into the index scan.
    */
  def nearestCellsLocal(v: Array[Double], cents: Array[Array[Double]],
      nprobe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      var cc = 0.0; var vc = 0.0; var j = 0
      while (j < c.length) { cc += c(j) * c(j); vc += v(j) * c(j); j += 1 }
      (cc - 2 * vc, i)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq

  /** IVF probe-and-score over an ALREADY-ASSIGNED corpus — `assigned` must
    * carry (`idCol`, `vecCol`, "cell") where cell is the nearest-centroid id
    * under `cents`. This is [[ivfTopK]]'s scan stage split out so a
    * persistent inverted file (e.g. the streaming index of
    * [[graft.streaming.AnnIndexMaintainer]]) can be probed without
    * re-assigning the corpus per query.
    */
  def ivfSearchAssigned(assigned: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int, cents: Array[Array[Double]],
      rankOnRoundedTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nCells = cents.length
    val centArr = typedLit(cents.map(_.toSeq).toSeq)
    def rnd(c: Column): Column =
      rankOnRoundedTo.map(p => round(c, p)).getOrElse(c)
    def nearest(vec: Column, n: Int): Column = {
      // rank centroids by squared euclidean distance (|v|² is constant per
      // vector, so |c|² − 2·v·c orders identically — matches KMeans assignment)
      val scored = transform(sequence(lit(0), lit(nCells - 1)), i => {
        val cent = element_at(centArr, i + 1)
        struct(rnd(dot(cent, cent) - dot(vec, cent) * 2).as("d"), i.as("cid"))
      })
      slice(transform(array_sort(scored), s => s.getField("cid")), 1, n)
    }
    // norms ride along from one per-row pass; the pairwise score is a single
    // codegen'd dot over cached norms (see withNorm). Query probing keeps
    // the HOF top-n sort (queries are few).
    val cs = assigned.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"), col("cell"))
      .withColumn("cn", sqrt(aggregate(col("cv"), lit(0.0), (a, x) => a + x * x)))
    val qs = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
      .select(col("query_id"), col("qv"), col("qn"),
        explode(nearest(col("qv"), nprobe)).as("cell"))
    val scored = cs.join(broadcast(qs), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(rnd(col("cos")).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
