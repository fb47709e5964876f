package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("custom expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox", Array(1.0f, 2.0f)),
      (2L, "the quick brown cat", Array(3.0f, 4.0f)))
      .toDF("id", "text", "vec").createOrReplaceTempView("ext_docs")
    val sh = spark.sql(
      "SELECT id, graft_shingles(text, 2) AS sh FROM ext_docs ORDER BY id").collect()
    assert(sh.head.getSeq[String](1) ==
      Seq("the quick", "quick brown", "brown fox"))
    val sim = spark.sql(
      "SELECT graft_simhash(text) FROM ext_docs").collect().map(_.getLong(0))
    assert(sim.distinct.length == 2) // different texts, different fingerprints
    val mh = spark.sql(
      "SELECT graft_minhash(graft_shingles(text, 2), 16) FROM ext_docs").head()
    assert(mh.getSeq[Long](0).size == 16)
    val dot = spark.sql(
      "SELECT graft_dot(vec, vec) AS d FROM ext_docs WHERE id = 1").head()
    assert(dot.getDouble(0) == 5.0)
    val rep = spark.sql(
      "SELECT graft_repetition('spam spam spam', 2) AS r").head()
    assert(rep.getDouble(0) == 1.0)
  }
}
