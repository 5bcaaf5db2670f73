package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A LEARNED embedding tower — a seeded, closed-form linear projection
  * head trained on (vector → label) pairs — to prove the retrieval
  * plumbing (brute/IVF/hybrid, one-shot and maintained) is model-agnostic:
  * every consumer takes an embedding column, so swapping the closed-form
  * text tower for trained weights is a column substitution, not a
  * rewrite.
  *
  * Training is ridge regression against one-hot labels solved by the
  * NORMAL EQUATIONS: W = (XᵀX + λI)⁻¹ XᵀY. The Gram matrix XᵀX (d×d) and
  * moment matrix XᵀY (d×L) accumulate distributively in ONE pass over the
  * corpus (`treeAggregate`, the same shape Spark ML's "normal" solver
  * uses — per-partition dense accumulation is the textbook case for
  * dropping below the DataFrame API), then the d×d system is solved
  * driver-side by Cholesky — O(N·d·(d+L)) distributed work, O(d²) driver
  * memory, no iteration, no collect of data rows. At 100 TB the one pass
  * is the scan; d stays model-sized.
  *
  * Weights persist as a (j, k, w) frame — the artifact contract the ANN
  * oracles use: determinism of training is irrelevant to the compare
  * because both engines project through the SAME persisted weights.
  */
object Tower {

  /** Train the ridge head. Returns the weight frame (j = input dim index,
    * k = output dim index = position of the label in sorted label order,
    * w DOUBLE). λ > 0 keeps the system positive-definite regardless of
    * corpus rank.
    */
  def ridgeHead(df: DataFrame, vecCol: String, labelCol: String,
      lambda: Double = 1e-3): DataFrame = {
    require(lambda > 0.0, "lambda must be > 0 (positive-definite system)")
    val spark = df.sparkSession
    import spark.implicits._
    val labels = df.select(col(labelCol).cast("int").as("l"))
      .where(col("l").isNotNull).distinct()
      .collect().map(_.getInt(0)).sorted
    require(labels.nonEmpty, "no labels to train on")
    val labelIdx = labels.zipWithIndex.toMap
    val data = df.select(col(vecCol).cast("array<double>").as("v"),
        col(labelCol).cast("int").as("l"))
      .where(col("v").isNotNull && col("l").isNotNull)
    val d = data.select(size(col("v"))).head().getInt(0)
    val L = labels.length
    // one distributed pass: per-partition dense accumulation of XᵀX, XᵀY
    val (xtx, xty) = data
      .rdd.map(r => (r.getSeq[Double](0).toArray, labelIdx(r.getInt(1))))
      .treeAggregate((new Array[Double](d * d), new Array[Double](d * L)))(
        seqOp = { case ((a, b), (x, y)) =>
          // d was inferred from one row; ragged input would otherwise
          // silently truncate longer vectors into the Gram accumulation
          // (and crash opaquely on shorter ones)
          require(x.length == d,
            s"ridgeHead: non-uniform vector length ${x.length} (expected " +
              s"$d, inferred from the first row) — every $vecCol value " +
              "must have the same dimensionality")
          var i = 0
          while (i < d) {
            val xi = x(i)
            if (xi != 0.0) {
              var j = 0
              while (j < d) { a(i * d + j) += xi * x(j); j += 1 }
              b(i * L + y) += xi
            }
            i += 1
          }
          (a, b)
        },
        combOp = { case ((a1, b1), (a2, b2)) =>
          var i = 0
          while (i < a1.length) { a1(i) += a2(i); i += 1 }
          i = 0
          while (i < b1.length) { b1(i) += b2(i); i += 1 }
          (a1, b1)
        })
    var i = 0
    while (i < d) { xtx(i * d + i) += lambda; i += 1 }
    val w = choleskySolve(xtx, xty, d, L)
    (0 until d).flatMap(j => (0 until L).map(k => (j, k, w(j * L + k))))
      .toDF("j", "k", "w")
  }

  /** Solve A·W = B for SPD A (row-major d×d), B row-major d×L. */
  private def choleskySolve(a: Array[Double], b: Array[Double], d: Int,
      nrhs: Int): Array[Double] = {
    // in-place lower-triangular Cholesky factor
    val l = a.clone()
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = l(i * d + j)
        var k = 0
        while (k < j) { s -= l(i * d + k) * l(j * d + k); k += 1 }
        if (i == j) {
          require(s > 0.0, s"matrix not positive definite at $i")
          l(i * d + i) = math.sqrt(s)
        } else l(i * d + j) = s / l(j * d + j)
        j += 1
      }
      i += 1
    }
    val x = b.clone()
    // forward substitution L·Z = B
    i = 0
    while (i < d) {
      var c = 0
      while (c < nrhs) {
        var s = x(i * nrhs + c)
        var k = 0
        while (k < i) { s -= l(i * d + k) * x(k * nrhs + c); k += 1 }
        x(i * nrhs + c) = s / l(i * d + i)
        c += 1
      }
      i += 1
    }
    // back substitution Lᵀ·W = Z
    i = d - 1
    while (i >= 0) {
      var c = 0
      while (c < nrhs) {
        var s = x(i * nrhs + c)
        var k = i + 1
        while (k < d) { s -= l(k * d + i) * x(k * nrhs + c); k += 1 }
        x(i * nrhs + c) = s / l(i * d + i)
        c += 1
      }
      i -= 1
    }
    x
  }

  /** Persisted weight frame back to column-major form: result(k) is the
    * d-vector of output dim k (small by construction: d·L rows).
    */
  def weightsFromDf(df: DataFrame): Array[Array[Double]] = {
    val rows = df.select(col("j").cast("int"), col("k").cast("int"),
      col("w").cast("double")).collect()
    val d = rows.map(_.getInt(0)).max + 1
    val L = rows.map(_.getInt(1)).max + 1
    val w = Array.fill(L)(new Array[Double](d))
    rows.foreach(r => w(r.getInt(1))(r.getInt(0)) = r.getDouble(2))
    w
  }

  /** The projection column: x ↦ [round(x·w₀, s), …, round(x·w_{L−1}, s)] —
    * L codegen dot products against literal weight columns
    * ([[graft.functions.DotProduct]], sequential summation, so DuckDB's
    * `list_inner_product` over the same persisted weights is bitwise
    * identical before the rounding). Rounding (default 6) pins the
    * projected values so every DOWNSTREAM consumer (cosine, quantizer
    * assignment) reads cross-engine-identical inputs.
    */
  def project(vec: Column, weights: Array[Array[Double]],
      roundTo: Int = 6): Column =
    array(weights.map(wk => round(graft.functions.VectorFns.dotNative(
      vec.cast("array<double>"), typedLit(wk.toSeq)), roundTo)): _*)
}
