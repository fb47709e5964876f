package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("saltedJoin output equals plain join on a skewed key distribution") {
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, s"row$i")).toDF("k", "payload")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (99L, "absent"))
      .toDF("k", "name")

    for (jt <- Seq("inner", "left"); salt <- Seq(1, 8)) {
      val plain = fact.join(dim, Seq("k"), jt)
        .orderBy("k", "payload").collect().map(_.toSeq).toSeq
      val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), salt, jt)
        .orderBy("k", "payload").collect().map(_.toSeq).toSeq
      assert(salted == plain, s"joinType=$jt salt=$salt")
    }
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val fact = (1 to 1000).map(i => (42L, s"row$i")).toDF("k", "payload")
    val dim = Seq((42L, "hot")).toDF("k", "name")
    // count distinct salt values actually assigned (pre-drop instrumentation:
    // replicate what saltedJoin does internally)
    val salts = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(salts > 1, "hot key rows must land in multiple salt buckets")
    // and the join still returns every row exactly once
    assert(SkewJoin.saltedJoin(fact, dim, Seq("k"), 8).count() == 1000)
  }

  test("saltedJoin validates arguments") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(df, df, Seq("k"), 0))
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(df, df, Seq("k"), 2, "full"))
  }
}
