package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * All arithmetic is an explicit left-fold in DOUBLE
  * (`aggregate(zip_with(...))`), matching the DuckDB oracle's
  * `list_reduce(list_transform(...))` op-for-op: float×float is exact in
  * double and both engines fold left sequentially, so cosine scores are
  * bit-identical and top-k is deterministically comparable.
  */
object VectorOps {

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Compiled left-fold dot product (custom expression) — bit-identical to
    * `aggregate(zip_with(...))` but ~an order of magnitude faster, since
    * higher-order-function lambdas are interpreted per element. */
  def dot(a: Column, b: Column): Column = graft.text.TextExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Queries are broadcast (small side); rank ties broken by neighbor id.
    * Result: (qid, nid, score, rnk).
    *
    * Per-row norms are computed ONCE per vector before the |corpus| ×
    * |queries| scoring join, so the quadratic stage runs one dot product
    * per pair instead of three. `sqrt(dot(v,v))` yields the identical
    * double either way, so scores stay bit-identical to the oracle.
    *
    * Scale: |corpus| × |queries| scored rows, shuffled only by qid for the
    * rank window. The scale path for big query sets is [[IvfIndex]]. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.withColumn("qn", norm(col("qe")))
    // the |corpus|×|queries| scoring streams the corpus side against the
    // broadcast queries — spread the unsplittable corpus scan so the
    // quadratic stage parallelizes (no-op on wide input)
    val c = graft.operators.Spread.wideScan(corpus, weight = 64L)
      .withColumn("nn", norm(col("ne")))
    val scored = c.alias("c")
      .join(broadcast(q.alias("q")), col("q.qid") =!= col("c.nid"))
      .select(col("q.qid"), col("c.nid"),
        (dot(col("q.qe"), col("c.ne")) / (col("q.qn") * col("c.nn"))).as("score"))
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("nid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with a < b and
    * cosine ≥ threshold. Brute-force O(n²/2) scoring — the oracle-checkable
    * baseline; at corpus scale, bucket first with [[IvfIndex.bucketed]] and
    * compare only within buckets. Norms are precomputed per row (see
    * [[bruteForceTopK]]) so the n²/2 stage pays one dot, not three. */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // the inequality join plans as a nested-loop over the streamed `a`
    // side; spreading the unsplittable scan parallelizes the n²/2 scoring
    // n²/2 dot products over the streamed side: per input row the CPU is
    // ~|corpus| dots, so the weight keeps this wide even at small row counts
    val wide = graft.operators.Spread.wideScan(df, weight = 1024L)
    val a = wide.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", norm(col("va")))
    val b = wide.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic random-hyperplane signature: bit i = sign of the dot
    * product with plane i, whose components are ±1 derived from a hash of
    * (plane, dim) — reproducible with no RNG state. Compiled expression
    * (one tight loop per row); bit-identical to
    * [[hyperplaneSignatureInterpreted]]. */
  def hyperplaneSignature(vec: Column, nPlanes: Int, dims: Int): Column =
    VectorExpressions.hyperplaneSig(vec, nPlanes, dims)

  /** Reference formulation via built-in HOFs — interpreted lambdas, kept as
    * the spec cross-check for the compiled expression. Ragged vectors are
    * zero-padded/truncated to `dims` (coalesce on both zip_with sides), so
    * this stays bit-identical to the compiled loop — which sums
    * min(len, dims) terms — for any vector length, not just len == dims. */
  private[vector] def hyperplaneSignatureInterpreted(vec: Column, nPlanes: Int,
      dims: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val planeDot = aggregate(
        zip_with(toDouble(vec),
          array((0 until dims).map(j => lit(planeComponent(p, j))): _*),
          (x, s) => coalesce(x, lit(0.0)) * coalesce(s, lit(0.0))),
        lit(0.0), (acc, x) => acc + x)
      when(planeDot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  private[vector] def planeComponent(plane: Int, dim: Int): Double =
    // productHash is deprecated in favor of caseClassHash, but the two
    // hash differently: migrating would flip hyperplane signs and change
    // every LSH bucket assignment (and the q34/q66 oracle fixtures)
    if (scala.util.hashing.MurmurHash3.productHash((plane, dim)) % 2 == 0) 1.0 else -1.0
}

/** IVF-style bucketed ANN: corpus vectors are assigned to LSH buckets by
  * hyperplane signature; a query probes only its own bucket (plus optional
  * multi-probe variants by flipping signature bits). At 100 TB the bucket
  * assignment is a narrow map + shuffle-by-bucket join instead of a full
  * cross join against the corpus.
  */
object IvfIndex {

  /** Add a `bucket` column from the first `nPlanes` hyperplane bits. */
  def bucketed(df: DataFrame, vecCol: String, nPlanes: Int, dims: Int): DataFrame =
    df.withColumn("bucket", VectorOps.hyperplaneSignature(col(vecCol), nPlanes, dims))

  /** Bucket-restricted cosine near-dup pairs from a pre-bucketed table:
    * pairs are compared only within equal hyperplane buckets, so the join
    * shuffles by bucket instead of the O(n²/2) cross join of
    * [[VectorOps.cosineDupPairs]] — the shape you'd run at corpus scale
    * (recall bounded by the LSH signature, not exact).
    * Result: (id_a, id_b, cos), id_a < id_b. */
  def dupPairsFromBuckets(bdf: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // NOT pinned: 256 hyperplane buckets spread the hash partitioning
    // fine on their own and the per-bucket pair volume is small — pins
    // A/B'd slower at gate scale (OPTIMIZATION_r21.md)
    val a = bdf.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", VectorOps.norm(col("va")))
    val b = bdf.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", VectorOps.norm(col("vb")))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos",
        VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Bucketed near-dup pairs end-to-end: signature → bucket join → cosine. */
  def dupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nPlanes: Int, dims: Int): DataFrame =
    dupPairsFromBuckets(bucketed(df, vecCol, nPlanes, dims), idCol, vecCol, threshold)

  /** Approximate top-k: probe the query's bucket and the `probes`-1 buckets
    * at Hamming distance 1 (bit flips), then exact-rank within candidates. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
      dims: Int, probes: Int = 1): DataFrame = {
    val cb = bucketed(corpus, "ne", nPlanes, dims)
    val qb = bucketed(queries, "qe", nPlanes, dims)
    val probeBuckets = (0 until math.min(probes, nPlanes + 1)).map {
      case 0 => col("bucket")
      case i => col("bucket").bitwiseXOR(lit(1L << (i - 1)))
    }
    val qProbes = qb.select(col("qid"), col("qe"),
      explode(array(probeBuckets: _*)).as("bucket"))
    val scored = cb.withColumn("nn", VectorOps.norm(col("ne")))
      .join(broadcast(qProbes.withColumn("qn", VectorOps.norm(col("qe")))),
        Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (VectorOps.dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("score"))
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("nid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}

/** Centroid-based IVF: deterministic Lloyd's k-means over the embedding
  * column, then cluster-restricted search — the second ANN scale path
  * next to the hyperplane-LSH [[IvfIndex]]. Real IVF trades the LSH
  * signature's data-independence for data-adapted partitions (better
  * recall per candidate at the same fan-out).
  *
  * Determinism: no RNG anywhere. Init = the k lowest-id vectors;
  * assignment = compiled nearest-centroid expression (ties to the lowest
  * index); centroid update = per-dimension DECIMAL-exact means, so the
  * result is independent of partial-aggregation order. The driver holds
  * only k×dims centroid cells per iteration — the same bounded driver
  * state every k-means implementation carries.
  */
object KMeansIvf {

  /** Train centroids. Returns k×dims doubles (clusters that lose all
    * members keep their previous position). */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int, dims: Int,
      iters: Int = 3): Array[Array[Double]] = {
    val D = org.apache.spark.sql.types.DecimalType(38, 15)
    var centroids: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Any](0).toArray.map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"$vecCol must be array<float|double>, got element $other")
      })
    var it = 0
    while (it < iters) {
      val assigned = df.select(
        VectorExpressions.nearestCentroid(col(vecCol), centroids).as("cluster"),
        col(vecCol).as("v"))
      // NOTE (r22): a dims-wide single-aggregate rewrite (64 decimal sum
      // columns grouped by cluster, no posexplode) was A/B'd HERE and
      // reverted — every train-using gate regressed ~0.7-0.8 s on a full
      // bench run (q57/q93/q157/q42), consistent with per-iteration
      // whole-stage-codegen compilation of the wide aggregate: each
      // Lloyd's round plans a FRESH query (new centroid literals), so
      // codegen cost recurs per round and dwarfs the small shuffle this
      // removed. The posexplode shape keeps the generated class small.
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg((sum(col("x").cast(D)).cast("double") / count(lit(1))).as("mean"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Add a `cluster` column (compiled nearest-centroid assignment). */
  def assign(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("cluster",
      VectorExpressions.nearestCentroid(col(vecCol), centroids))

  /** Cluster-restricted cosine near-dup pairs from a pre-assigned table:
    * the join shuffles by cluster, cost Σ cluster² instead of n²/2.
    * Result: (id_a, id_b, cos), id_a < id_b. */
  def dupPairsFromClusters(adf: DataFrame, idCol: String, vecCol: String,
      threshold: Double, salt: Int = 1): DataFrame = {
    // `salt > 1` splits each cluster's pair generation S ways (guide §2.5
    // hot-key salting): side a keeps ONE deterministic salt per row, side
    // b replicates across all S, so every within-cluster pair still joins
    // exactly once — use when the cluster count is below the core count
    // (k=8 clusters would otherwise bound parallelism at 8 at ANY scale).
    // The cost is ×S duplication of the b side, so leave salt=1 when
    // clusters ≫ cores. Output is identical for any salt.
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val a = adf.select(col("cluster"), col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", VectorOps.norm(col("va")))
      .withColumn("__salt",
        pmod(xxhash64(col("id_a")), lit(salt)).cast("int"))
    val b = adf.select(col("cluster"), col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", VectorOps.norm(col("vb")))
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    // ONE shared pin count for both join sides (side b's explode would
    // otherwise estimate differently and force a second exchange); the
    // weight reflects the within-cluster quadratic scoring per input row
    val n = graft.operators.Spread.target(a, weight = 64L)
    a.repartition(n, col("cluster"), col("__salt"))
      .join(b.repartition(n, col("cluster"), col("__salt")),
        Seq("cluster", "__salt"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos",
        VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Approximate top-k: score each query only against the `probes` nearest
    * clusters' members (standard IVF probing), exact rank within. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Array[Array[Double]], probes: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = assign(corpus, "ne", centroids)
    // per-query distances to every centroid -> `probes` nearest clusters
    val centDf = queries.sparkSession.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
    ).toDF("cluster", "cent")
    val qc = queries.join(broadcast(centDf))
      .withColumn("dist",
        VectorOps.dot(col("qe"), col("qe")) -
          lit(2.0) * VectorOps.dot(col("qe"), col("cent")) +
          VectorOps.dot(col("cent"), col("cent")))
    val wq = Window.partitionBy("qid").orderBy(col("dist"), col("cluster"))
    val qProbes = qc.withColumn("pr", row_number().over(wq))
      .where(col("pr") <= probes)
      .select(col("qid"), col("qe"), col("cluster"))
    val scored = cb.withColumn("nn", VectorOps.norm(col("ne")))
      .join(broadcast(qProbes.withColumn("qn", VectorOps.norm(col("qe")))),
        Seq("cluster"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (VectorOps.dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("score"))
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("nid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
