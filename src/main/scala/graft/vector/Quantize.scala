package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the memory/IO scale
  * lever for vector search: a 64-dim float32 embedding is 256 bytes, its
  * int8 form is 64 bytes + one float scale. At 100 TB of embeddings that
  * 4× cut is the difference between an ANN pass that fits executor memory
  * and one that spills; quantized integer dot products are also
  * ORDER-INDEPENDENT (exact integer sums), so scores are reproducible at
  * any parallelism — no float-summation drift between cluster sizes.
  *
  * Symmetric per-vector scheme: scale = 127 / max|x_i|, q_i =
  * floor(x_i·scale + 0.5) ∈ [-127, 127]. Cosine over quantized vectors
  * divides the per-vector scales OUT (they cancel in the ratio), so
  * quantized cosine ≈ float cosine with bounded rounding error (≤ ~1%
  * at 64 dims) — and is bit-identical to any other engine computing the
  * same integer math, which is what gate q66 checks against DuckDB.
  */
object Quantize {

  /** int8-quantize `vecCol` (array<float/double>): adds `qCol`
    * (array<int> in [-127,127]) and `scaleCol` (double; 0-vectors get
    * scale 0 and all-zero codes). floor(x+0.5) rounding — pure IEEE,
    * identical in every engine, unlike round-half-even variants. */
  def quantize(df: DataFrame, vecCol: String, qCol: String = "q",
      scaleCol: String = "q_scale"): DataFrame = {
    // compiled single-pass expression; the HOF formulation (aggregate
    // absMax referenced inside a per-element transform lambda) exploded
    // after CollapseProject inlined the aggregate into every element —
    // see VectorExpressions.Int8Quantize scaladoc
    val q8 = graft.vector.VectorExpressions.int8Quantize(col(vecCol))
    df.withColumn(scaleCol, q8.getField("scale"))
      .withColumn(qCol, q8.getField("q"))
  }

  /** Integer dot product of two quantized vectors — exact at any
    * parallelism (long arithmetic, no float folding). Compiled tight-loop
    * expression: the higher-order `aggregate(zip_with(...))` form
    * interprets two lambdas and allocates a zipped array per PAIR, which
    * measured 20× slower on the all-pairs stage. */
  def qdot(a: Column, b: Column): Column =
    graft.text.TextExpressions.qdot(a, b)

  /** Quantized cosine: integer dots, scales cancel. */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))

  /** Near-duplicate pairs over QUANTIZED vectors: all (id_a, id_b),
    * a < b, quantized cosine >= threshold. Brute-force O(n²/2) — the
    * oracle-checkable BASELINE for [[qDupPairsFromClusters]], same
    * relationship as [[VectorOps.cosineDupPairs]] to
    * [[KMeansIvf.dupPairsFromClusters]]. At corpus scale run the
    * cluster-restricted form; this one exists so the quantized kernels
    * have an exhaustive ground truth. */
  def qDupPairs(df: DataFrame, idCol: String, qCol: String,
      threshold: Double): DataFrame =
    pairsImpl(df, idCol, qCol, threshold, restrictOn = None)

  /** Cluster-restricted quantized near-dup pairs — the 100 TB composition:
    * `adf` carries a cluster/bucket column (from [[KMeansIvf.assign]] or
    * [[IvfIndex.bucketed]]) plus the int8 codes, so the pair join shuffles
    * 4× less data than the float form AND costs Σ cluster² instead of
    * n²/2. Integer dots → scores exact at any parallelism.
    * Result: (id_a, id_b, qcos), id_a < id_b. */
  def qDupPairsFromClusters(adf: DataFrame, idCol: String, qCol: String,
      threshold: Double, clusterCol: String = "cluster",
      salt: Int = 1): DataFrame =
    pairsImpl(adf, idCol, qCol, threshold, restrictOn = Some(clusterCol),
      salt = salt)

  /** Shared pair pipeline: the brute-force and cluster-restricted forms
    * differ ONLY in the equi-join key — one body, so they cannot drift.
    * `salt > 1` (cluster-restricted form only) splits each cluster's pair
    * generation S ways — side a keeps one deterministic salt, side b
    * replicates across all S — for when the cluster count is below the
    * core count (guide §2.5 hot-key salting; output identical). */
  private def pairsImpl(df: DataFrame, idCol: String, qCol: String,
      threshold: Double, restrictOn: Option[String],
      salt: Int = 1): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val keyCols = restrictOn.toSeq.map(col)
    val a0 = df.select(keyCols :+ col(idCol).as("id_a") :+ col(qCol).as("qa"): _*)
      .withColumn("na", sqrt(qdot(col("qa"), col("qa")).cast("double")))
    val b0 = df.select(keyCols :+ col(idCol).as("id_b") :+ col(qCol).as("qb"): _*)
      .withColumn("nb", sqrt(qdot(col("qb"), col("qb")).cast("double")))
    val joined = restrictOn match {
      case Some(k) =>
        val a = a0.withColumn("__salt",
          pmod(xxhash64(col("id_a")), lit(salt)).cast("int"))
        val b = b0.withColumn("__salt",
          explode(array((0 until salt).map(lit): _*)))
        // shared pin count for both sides (see VectorOps.dupPairsFromClusters)
        val n = graft.operators.Spread.target(a, weight = 64L)
        a.repartition(n, col(k), col("__salt"))
          .join(b.repartition(n, col(k), col("__salt")),
            Seq(k, "__salt"))
          .where(col("id_a") < col("id_b"))
      case None =>
        // inequality join streams side a against broadcast b — spread the
        // narrow scan so the n²/2 integer dots parallelize
        graft.operators.Spread.wideScan(a0, weight = 1024L)
          .join(b0, col("id_a") < col("id_b"))
    }
    joined
      .select(col("id_a"), col("id_b"),
        (qdot(col("qa"), col("qb")).cast("double") / (col("na") * col("nb")))
          .as("qcos"))
      .where(col("qcos") >= threshold)
  }
}
