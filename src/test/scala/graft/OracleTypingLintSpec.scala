package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over [[SparkEntry.oracleSql]] for the DuckDB aggregate-widening
  * trap that cost two rounds on q175: DuckDB's `SUM` over a BIGINT
  * expression returns HUGEINT (int128), while Spark's `sum` over LongType
  * returns LongType — the driver's hash compare is value-TYPE-sensitive,
  * so an oracle `SUM(CAST(… AS BIGINT))` without an explicit outer
  * `CAST(… AS BIGINT)` fails the gate with every value identical.
  *
  * The lint walks every oracle entry, finds each `SUM(` whose balanced
  * argument is a BIGINT expression (contains an `AS BIGINT` cast), and
  * requires the `SUM(…)` itself to be wrapped in `CAST(` — the exact
  * convention every passing incremental-sum gate (q122 et al.) already
  * follows. */
class OracleTypingLintSpec extends AnyFunSuite {

  /** Offsets of every `SUM(` in `sql` (case-insensitive, word-boundary). */
  private def sumSites(sql: String): Seq[Int] =
    raw"(?i)(?<![A-Z0-9_])SUM\s*\(".r.findAllMatchIn(sql).map(_.start).toSeq

  /** The balanced-paren argument of the call starting at `site` (offset of
    * the `SUM` keyword) — the text between its `(` and the matching `)`. */
  private def argOf(sql: String, site: Int): String = {
    val open = sql.indexOf('(', site)
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return sql.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    sql.substring(open + 1)
  }

  /** Is the call at `site` directly wrapped in an outer `CAST(` — i.e. the
    * nearest non-whitespace context to its left is `CAST(`? */
  private def castWrapped(sql: String, site: Int): Boolean = {
    val before = sql.substring(0, site).replaceAll("\\s+", " ")
    before.toUpperCase.endsWith("CAST(") || before.toUpperCase.endsWith("CAST( ")
  }

  private def violations(name: String, sql: String): Seq[String] =
    sumSites(sql).flatMap { site =>
      val arg = argOf(sql, site)
      val sumsBigint = raw"(?i)AS\s+BIGINT".r.findFirstIn(arg).isDefined
      if (sumsBigint && !castWrapped(sql, site))
        Some(s"$name: SUM over a BIGINT expression without an outer " +
          s"CAST(… AS BIGINT) — DuckDB widens to HUGEINT and the driver " +
          s"hash type-mismatches. Argument: ${arg.take(80)}")
      else None
    }

  test("every oracle SUM over BIGINT carries an explicit outer cast") {
    val all = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      violations(name, sql)
    }
    assert(all.isEmpty, all.mkString("\n"))
  }

  test("the lint would have caught q175's round-14/15 oracle bug") {
    // the exact shape that shipped (SparkEntry.scala:5049 before the fix)
    val broken =
      """SELECT l_returnflag, COUNT(*) AS n,
        |  SUM(CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)) AS sum_micro
        |FROM live GROUP BY l_returnflag""".stripMargin
    assert(violations("q175_changelog_rollup", broken).nonEmpty)
    // and passes the fixed form (q122's convention)
    val fixed =
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)) AS BIGINT) AS sum_micro
        |FROM live GROUP BY l_returnflag""".stripMargin
    assert(violations("q175_changelog_rollup", fixed).isEmpty)
  }
}
