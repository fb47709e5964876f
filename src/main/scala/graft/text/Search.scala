package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus: inverted-index construction and
  * BM25 ranking (Robertson & Zaragoza, "The Probabilistic Relevance
  * Framework: BM25 and Beyond", 2009) — the search primitive a curation
  * pipeline uses for targeted quality audits ("show me the docs about
  * X") and retrieval-based decontamination lookups.
  *
  * Scale posture: the index is ONE explode + groupBy shuffle keyed on
  * (token, doc); scoring FILTERS the postings to the query terms first
  * (a handful of tokens — the filter sits directly on the postings
  * scan), so corpus-sized data never joins corpus-sized data: the
  * per-term statistics ride a broadcast, and the final per-doc sum
  * groups only rows of docs that match at least one query term.
  *
  * Determinism (gate discipline, [[LanguageModel]]'s micro-unit rule):
  * every per-(doc, term) BM25 contribution is quantized to integer
  * micro-units — floor(x·1e6 + 0.5), pure IEEE mul/add/floor identical
  * in any engine — BEFORE the per-doc sum, which is then exact integer
  * arithmetic with no float-summation-order freedom.
  */
object Search {

  /** Postings: (token, doc_id, tf), empty-string tokens dropped. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Spread.wideScan(df, weight = 48L)
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** BM25 scores of every document matching ≥1 query term:
    * (doc_id, n_terms, score_micro) where score_micro is the integer
    * micro-unit sum of per-term contributions and n_terms the number of
    * distinct query terms present. Query terms are matched after the
    * same normalization as the index (lowercase, whitespace split). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val terms = query.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    // r22: the full postings table is NOT built/checkpointed anymore — a
    // query touches a handful of terms, so materializing O(corpus tokens)
    // rows to read a few hundred back was the gates' dominant cost
    // (QueryProf: 35 MB checkpoint written + re-read per consumer).
    //  - doc length = per-doc token count, a narrow map over the corpus
    //    (`tokens` is a whitespace split of the trimmed text, so a doc has
    //    >= 1 posting iff its trimmed text is nonempty, and its dl is
    //    exactly size(tokens)) — no explode, no shuffle;
    //  - the query postings keep the explode, but the term filter now sits
    //    directly under the (token, doc) aggregate (pushed through it by
    //    Catalyst), so only matching tokens reach the index shuffle.
    val docLen = df
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
      .localCheckpoint(eager = false) // (doc_id, dl) only — reused by
                                      // the corpus scalars + scoring join
    // corpus scalars: one aggregated row, broadcast
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_tokens"))
    // checkpoint the FILTERED postings (a few rows per matching doc), not
    // the corpus-sized index: qPost feeds both the df aggregate and the
    // scoring join, and without a checkpoint the tokenize/explode pass
    // would run once per consumer
    val qPost = invertedIndex(df, idCol, textCol)
      .where(col("token").isin(terms: _*))
      .localCheckpoint(eager = false)
    val dfreq = qPost.groupBy("token").agg(count(lit(1)).as("df"))
    qPost
      .join(broadcast(dfreq), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("tfpart",
        col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("c_micro",
        floor(col("idf") * col("tfpart") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("c_micro").as("score_micro"))
  }

  /** Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion
    * (Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion outperforms
    * Condorcet and individual rank learning methods", SIGIR'09): BM25
    * ranks one candidate pool, embedding-cosine similarity to a query
    * vector ranks another, and each doc's fused score is
    * Σ 1/(rrfK + rank) over the lists it appears in — the standard
    * two-tower RAG retrieval pattern.
    *
    * Scale posture: each ranker reduces to its top `poolK` via a
    * TakeOrdered heap (never a global sort), so the only unpartitioned
    * windows run over constant-size poolK-row frames, and the fused
    * outer join touches ≤ 2·poolK rows. The vector side broadcasts the
    * single query vector; the BM25 side inherits [[bm25]]'s
    * postings-filter-first shape.
    *
    * Determinism: ranks tie-break on doc id in both rankers; the fused
    * score is the INTEGER 10⁹ div (rrfK + rank) — no float enters, so
    * the gate compares integers end-to-end (q144). */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame, idCol: String,
      textCol: String, vecIdCol: String, vecCol: String,
      query: Seq[String], queryVecId: Long, poolK: Int = 50,
      rrfK: Int = 60, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bmPool = bm25(docs, idCol, textCol, query)
      .orderBy(desc("score_micro"), col("doc_id")).limit(poolK)
    val bmRanked = bmPool.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("score_micro"), col("doc_id")))
        .cast("long").as("bm_rank"))
    val qv = embeddings.where(col(vecIdCol) === queryVecId)
      .select(col(vecCol).as("qe"))
    val vecPool = embeddings.where(col(vecIdCol) =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col(vecIdCol).as("doc_id"),
        graft.vector.VectorOps.cosine(col(vecCol), col("qe")).as("cos"))
      .orderBy(desc("cos"), col("doc_id")).limit(poolK)
    val vecRanked = vecPool.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("cos"), col("doc_id")))
        .cast("long").as("vec_rank"))
    bmRanked.join(vecRanked, Seq("doc_id"), "full_outer")
      .withColumn("rrf_nano",
        coalesce(expr(s"1000000000L div ($rrfK + bm_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000L div ($rrfK + vec_rank)"), lit(0L)))
      .orderBy(desc("rrf_nano"), col("doc_id")).limit(topN)
  }

  /** BATCHED [[hybridRrf]]: retrieval for Q queries in ONE pass over the
    * corpus — (query_id, terms, query-vector id) triples in, the per-query
    * fused top-N out as (query_id, doc_id, bm_rank, vec_rank, rrf_nano).
    *
    * Scale posture: the corpus-sized work is paid ONCE for the whole
    * batch, not per query — one postings build, one doc-length aggregate,
    * one filter to the UNION of all query terms (document frequency is a
    * per-token corpus statistic, so it is shared too), one embedding
    * scan. The query batch itself (terms and vectors — Q·dims values)
    * rides a broadcast into both sides, and every ranking runs as a
    * `row_number` window PARTITIONED by query_id — Q parallel rank
    * computations, never a single-partition sort. Q single-query calls
    * would re-scan the corpus Q times; the batch makes retrieval
    * throughput per query ~Q× cheaper, which is what an embedding-based
    * decontamination or RAG-eval sweep over thousands of queries needs.
    *
    * Determinism: identical arithmetic to [[hybridRrf]] (integer
    * micro-unit BM25, integer 10⁹ div fusion, doc-id tie-breaks), so a
    * batch of one query returns exactly the single-query result. */
  def hybridRrfBatch(docs: DataFrame, embeddings: DataFrame, idCol: String,
      textCol: String, vecIdCol: String, vecCol: String,
      queries: Seq[(Long, Seq[String], Long)], poolK: Int = 50,
      rrfK: Int = 60, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "need at least one query")
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = queries.flatMap { case (qid, terms, _) =>
      terms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct.map((qid, _))
    }.toDF("query_id", "token")
    val allTerms =
      queries.flatMap(_._2.map(_.trim.toLowerCase).filter(_.nonEmpty)).distinct
    require(allTerms.nonEmpty, "queries must contain at least one term")

    // same shape as [[bm25]] (r22): doc lengths from a narrow per-doc
    // token count, query postings filtered BELOW the index aggregate —
    // the full postings table never materializes
    val docLen = docs
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
      .localCheckpoint(eager = false) // (doc_id, dl) only — reused by
                                      // the corpus scalars + scoring join
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_tokens"))
    // one postings filter for the whole batch: the union of query terms;
    // checkpointed lazily (tiny) so the tokenize/explode pass runs once
    // for its two consumers (df aggregate + scoring join)
    val qPost = invertedIndex(docs, idCol, textCol)
      .where(col("token").isin(allTerms: _*))
      .localCheckpoint(eager = false)
    val dfreq = qPost.groupBy("token").agg(count(lit(1)).as("df"))
    val contrib = qPost
      .join(broadcast(dfreq), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("tfpart",
        col("tf").cast("double") * lit(1.2 + 1.0) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(1.0 - 0.75) + lit(0.75) * col("dl") / col("avgdl"))))
      .withColumn("c_micro",
        floor(col("idf") * col("tfpart") * lit(1e6) + lit(0.5)).cast("long"))
    // fan each (token, doc) contribution out to the queries that contain
    // the token — the batch is tiny, so this join broadcasts — then sum
    // per (query, doc)
    val bm = contrib.join(broadcast(qTerms), "token")
      .groupBy("query_id", "doc_id").agg(sum("c_micro").as("score_micro"))
    val wB = Window.partitionBy("query_id")
      .orderBy(desc("score_micro"), col("doc_id"))
    val bmRanked = bm
      .withColumn("bm_rank", row_number().over(wB).cast("long"))
      .where(col("bm_rank") <= poolK)
      .select("query_id", "doc_id", "bm_rank")

    val qMap = queries.map(q => (q._1, q._3)).toDF("query_id", "q_vec_id")
    val qVecs = embeddings
      .select(col(vecIdCol).as("q_vec_id"), col(vecCol).as("qe"))
      .join(broadcast(qMap), "q_vec_id")
    val scored = embeddings
      // broadcast nested-loop by construction: Q query vectors against the
      // embedding scan, each query excluding its own vector
      .join(broadcast(qVecs), col(vecIdCol) =!= col("q_vec_id"))
      .select(col("query_id"), col(vecIdCol).as("doc_id"),
        graft.vector.VectorOps.cosine(col(vecCol), col("qe")).as("cos"))
    val wV = Window.partitionBy("query_id").orderBy(desc("cos"), col("doc_id"))
    val vecRanked = scored
      .withColumn("vec_rank", row_number().over(wV).cast("long"))
      .where(col("vec_rank") <= poolK)
      .select("query_id", "doc_id", "vec_rank")

    val fused = bmRanked
      .join(vecRanked, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_nano",
        coalesce(expr(s"1000000000L div ($rrfK + bm_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000L div ($rrfK + vec_rank)"), lit(0L)))
    val wF = Window.partitionBy("query_id")
      .orderBy(desc("rrf_nano"), col("doc_id"))
    fused.withColumn("rn", row_number().over(wF)).where(col("rn") <= topN)
      .drop("rn")
  }
}
