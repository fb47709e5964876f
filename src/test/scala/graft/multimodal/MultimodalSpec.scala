package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mediaDf = {
    val rows = (1L to 20L).map { i =>
      // deterministic fake media payloads of varying size
      (i, Array.tabulate[Byte]((i * 37 % 256 + 64).toInt)(j => ((i * 31 + j) % 127).toByte))
    }
    rows.toDF("media_id", "content")
  }

  test("attachMeta produces typed metadata struct") {
    val withMeta = Multimodal.attachMeta(mediaDf)
    assert(withMeta.schema("meta").dataType == Multimodal.MetaType)
    val m = withMeta.select($"meta.width", $"meta.height", $"meta.duration_ms").head
    assert(m.getInt(0) >= 1 && m.getInt(0) <= 1920)
    assert(m.getInt(1) >= 1 && m.getInt(1) <= 1080)
    assert(m.getLong(2) > 0)
  }

  test("extractFeatures: batched mapPartitions, fixed dims, deterministic") {
    val ex = Multimodal.FeatureExtractor.stub(8)
    val feats = Multimodal.extractFeatures(mediaDf, ex).cache()
    assert(feats.columns.toSeq == Seq("media_id", "features"))
    assert(feats.count() == 20)
    assert(feats.select(size($"features")).distinct().head.getInt(0) == 8)
    val a = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.extractFeatures(mediaDf, ex)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    // extracted features survive into vector ops (plumbing end-to-end)
    val asVec = feats.select($"media_id".as("nid"), $"features".as("ne"))
    val q = asVec.limit(2).select($"nid".as("qid"), $"ne".as("qe"))
    val knn = graft.vector.VectorOps.bruteForceTopK(q, asVec, k = 3)
    assert(knn.groupBy("qid").count().collect().forall(_.getLong(1) == 3))
  }

  test("frameSample slices deterministic fixed-size frames") {
    val frames = Multimodal.frameSample(mediaDf, frameBytes = 32, everyN = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame"))
    val lens = frames.select(length($"frame")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lens == Set(32))
    // frame numbers step by everyN
    val steps = frames.where($"media_id" === 20L).select("frame_no")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(steps == steps.indices.map(_ * 2))
  }

  test("repartitionByBytes sizes partitions by payload budget") {
    val df = Multimodal.repartitionByBytes(mediaDf, targetBytes = 500)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() == 20)
  }

  test("media features feed centroid-IVF clustering end to end") {
    // multimodal -> stub feature extraction -> deterministic k-means:
    // the ANN scale path consumes extracted features with no glue code
    val feats = Multimodal.extractFeatures(mediaDf,
      Multimodal.FeatureExtractor.stub(featureDims = 16))
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val centroids = graft.vector.KMeansIvf.train(
      feats, "vec_id", "embedding", k = 3, dims = 16, iters = 2)
    val assigned = graft.vector.KMeansIvf.assign(feats, "embedding", centroids)
    assert(assigned.count() == 20)
    assert(assigned.select("cluster").distinct().count() <= 3)
    // deterministic: same payloads -> same clusters
    val again = graft.vector.KMeansIvf.assign(feats, "embedding",
      graft.vector.KMeansIvf.train(feats, "vec_id", "embedding", 3, 16, 2))
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val first = assigned.select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(first == again)
  }
}
