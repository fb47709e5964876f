package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks latest right at-or-before left time per key") {
    val quotes = Seq( // (sym, time, px)
      ("A", ts("2024-01-01 09:00:00"), 10.0),
      ("A", ts("2024-01-01 10:00:00"), 11.0),
      ("A", ts("2024-01-01 11:00:00"), 12.0),
      ("B", ts("2024-01-01 09:30:00"), 100.0)).toDF("sym", "qt", "px")
    val trades = Seq( // (sym, time, qty)
      ("A", ts("2024-01-01 09:59:59"), 5L),
      ("A", ts("2024-01-01 10:00:00"), 6L), // equal ts matches the 10:00 quote
      ("A", ts("2024-01-01 23:00:00"), 7L),
      ("B", ts("2024-01-01 09:00:00"), 8L), // before any quote -> null
      ("C", ts("2024-01-01 09:00:00"), 9L)) // unseen key -> null
      .toDF("sym", "tt", "qty")
    val got = AsOfJoin.asofBackward(trades, quotes, "sym", "sym", "tt", "qt")
      .collect().map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSet
    assert(got == Set(
      ("A", 5L, 10.0), ("A", 6L, 11.0), ("A", 7L, 12.0),
      ("B", 8L, null), ("C", 9L, null)))
  }

  test("left columns/rows preserved; one output row per left row") {
    val right = Seq(("k", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val left = Seq.tabulate(100)(i =>
      ("k", ts(f"2024-01-02 ${i % 24}%02d:00:00"), s"row$i")).toDF("k", "t", "tag")
    val out = AsOfJoin.asofBackward(left, right, "k", "k", "t", "t")
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("k", "t", "tag", "t_right", "v"))
    assert(out.where($"v" === 1.0).count() == 100)
  }
}
