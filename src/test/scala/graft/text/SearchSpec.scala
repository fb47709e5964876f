package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  val corpus = Seq(
    (1L, "hash join beats nested loop join"),
    (2L, "sort merge join shuffles both sides"),
    (3L, "broadcast hash join avoids the shuffle entirely"),
    (4L, "window functions need a sort"),
    (5L, ""))

  lazy val df = corpus.toDF("doc_id", "text")

  /** Independent plain-Scala BM25 (no Spark, no shared code). */
  private def referenceBm25(query: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): Map[Long, (Long, Long)] = {
    val docs = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val dfreq = query.map(q => q -> docs.count(_._2.contains(q))).toMap
    docs.flatMap { case (id, toks) =>
      val contribs = query.flatMap { q =>
        val tf = toks.count(_ == q).toDouble
        if (tf == 0) None
        else {
          val idf = math.log((n - dfreq(q) + 0.5) / (dfreq(q) + 0.5) + 1.0)
          val tfp = tf * (k1 + 1.0) /
            (tf + k1 * ((1.0 - b) + b * toks.size / avgdl))
          Some(math.floor(idf * tfp * 1e6 + 0.5).toLong)
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> ((contribs.size.toLong, contribs.sum)))
    }
  }

  test("invertedIndex: tf per (token, doc), empty docs absent") {
    val idx = Search.invertedIndex(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(idx(("join", 1L)) == 2L)
    assert(idx(("join", 2L)) == 1L)
    assert(!idx.keys.exists(_._2 == 5L), "empty doc must have no postings")
  }

  test("bm25 matches an independent scalar implementation") {
    val got = Search.bm25(df, "doc_id", "text", Seq("join", "hash"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val expect = referenceBm25(Seq("join", "hash"))
    assert(got == expect)
    // doc 1 mentions join twice + hash once: top score
    assert(got(1L)._2 == got.values.map(_._2).max)
    assert(!got.contains(4L), "doc without query terms must be absent")
  }

  test("rarer term scores higher than a common one at equal tf") {
    // "nested" df=1, "join" df=3 — one occurrence each in doc 1
    val got = Search.bm25(df, "doc_id", "text", Seq("nested"))
      .union(Search.bm25(df, "doc_id", "text", Seq("sort")))
      .collect()
    val nested = Search.bm25(df, "doc_id", "text", Seq("nested"))
      .where(col("doc_id") === 1L).head.getLong(2)
    val join1 = Search.bm25(df, "doc_id", "text", Seq("beats"))
      .where(col("doc_id") === 1L).head.getLong(2)
    assert(nested == join1, "equal-df equal-tf terms score identically")
    assert(got.nonEmpty)
  }

  test("hybridRrf == independent rank fusion of scalar BM25 + scalar cosine") {
    // embeddings aligned with corpus ids; vec 1 is the query vector
    val vecs = Map(
      1L -> Array(1.0f, 0.0f, 0.0f),
      2L -> Array(0.9f, 0.1f, 0.0f),   // closest to the query
      3L -> Array(0.0f, 1.0f, 0.0f),
      4L -> Array(0.5f, 0.5f, 0.0f),
      5L -> Array(0.0f, 0.0f, 1.0f))
    val emb = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Search.hybridRrf(df, emb, "doc_id", "text", "vec_id",
      "embedding", query = Seq("join", "hash"), queryVecId = 1L,
      poolK = 3, rrfK = 60, topN = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getLong(3)))).toMap
    // scalar twin: BM25 ranks from referenceBm25, cosine ranks by hand
    val bmRank = referenceBm25(Seq("join", "hash")).toSeq
      .sortBy { case (id, (_, s)) => (-s, id) }.take(3)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val vecRank = vecs.toSeq.filter(_._1 != 1L)
      .map { case (id, v) => id -> cos(v, vecs(1L)) }
      .sortBy { case (id, c) => (-c, id) }.take(3)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val ids = (bmRank.keySet ++ vecRank.keySet)
    val expect = ids.map { id =>
      val rrf = bmRank.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        vecRank.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      id -> ((bmRank.get(id), vecRank.get(id), rrf))
    }.toSeq.sortBy { case (id, (_, _, rrf)) => (-rrf, id) }.take(4).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, (br, vr, rrf)) =>
      val (gbr, gvr, grrf) = got(id)
      assert(gbr.map(_.asInstanceOf[Long]) == br && gvr.map(_.asInstanceOf[Long]) == vr,
        s"ranks for doc $id")
      assert(grrf == rrf, s"rrf for doc $id")
    }
    // a doc present in BOTH lists must outrank one present in only one
    // list at similar single-list rank (the RRF consensus property)
    assert(got.contains(2L) && got(2L)._1.isDefined && got(2L)._2.isDefined)
  }

  test("hybridRrfBatch: each query's slice equals its single-query run; " +
      "every rank window is partitioned by query_id") {
    val vecs = Map(
      1L -> Array(1.0f, 0.0f, 0.0f),
      2L -> Array(0.9f, 0.1f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.0f),
      4L -> Array(0.5f, 0.5f, 0.0f),
      5L -> Array(0.0f, 0.0f, 1.0f))
    val emb = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val queries = Seq(
      (10L, Seq("join", "hash"), 1L),
      (20L, Seq("sort", "shuffle"), 3L))
    val batch = Search.hybridRrfBatch(df, emb, "doc_id", "text", "vec_id",
      "embedding", queries, poolK = 3, rrfK = 60, topN = 4)
    // identical arithmetic: a batch slice IS the single-query result
    queries.foreach { case (qid, terms, vid) =>
      val single = Search.hybridRrf(df, emb, "doc_id", "text", "vec_id",
        "embedding", terms, vid, poolK = 3, rrfK = 60, topN = 4)
        .select("doc_id", "bm_rank", "vec_rank", "rrf_nano")
      val slice = batch.where($"query_id" === qid)
        .select("doc_id", "bm_rank", "vec_rank", "rrf_nano")
      assert(slice.exceptAll(single).isEmpty &&
        single.exceptAll(slice).isEmpty,
        s"query $qid: batch slice != single-query result")
    }
    // scale shape: every window in the batch plan is keyed by query_id —
    // Q queries rank in parallel, never through one global sort partition
    val plan = batch.queryExecution.executedPlan.toString
    val windows = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("query_id#"),
      s"window not partitioned by query_id: $w"))
  }
}
