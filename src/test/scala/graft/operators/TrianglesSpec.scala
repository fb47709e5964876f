package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def triSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("K4 has 4 triangles, corners id-sorted") {
    val edges = (for {
      i <- 1L to 4L; j <- 1L to 4L if i < j
    } yield (i, j)).toDF("u", "v")
    val got = triSet(Triangles.triangles(edges, "u", "v"))
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("star graph (hub, no closures) has zero triangles") {
    val edges = (2L to 30L).map(i => (1L, i)).toDF("u", "v")
    assert(Triangles.triangles(edges, "u", "v").count() == 0)
  }

  test("reversed and duplicate edges canonicalize; self-loops dropped") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L)).toDF("u", "v")
    assert(triSet(Triangles.triangles(edges, "u", "v")) == Set((1L, 2L, 3L)))
  }

  test("matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      i <- 1 to n; j <- 1 to n
      if i < j && rnd.nextDouble() < 0.2
    } yield (i.toLong, j.toLong))
    val eset = edges.toSet
    val brute = (for {
      a <- 1 to n; b <- 1 to n; c <- 1 to n
      if a < b && b < c
      if eset((a.toLong, b.toLong)) && eset((b.toLong, c.toLong)) &&
        eset((a.toLong, c.toLong))
    } yield (a.toLong, b.toLong, c.toLong)).toSet
    val got = triSet(Triangles.triangles(edges.toDF("u", "v"), "u", "v"))
    assert(got == brute)
    assert(brute.nonEmpty, "seed must yield at least one triangle")
  }

  test("triangleCounts: each K4 node is in 3 triangles") {
    val edges = (for {
      i <- 1L to 4L; j <- 1L to 4L if i < j
    } yield (i, j)).toDF("u", "v")
    val counts = Triangles.triangleCounts(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
