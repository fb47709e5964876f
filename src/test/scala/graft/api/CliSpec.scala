package graft.api

import java.io.{ByteArrayOutputStream, PrintStream}

import org.scalatest.funsuite.AnyFunSuite
import graft.{Lakehouse, SparkFixture}

class CliSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def runCli(lh: Lakehouse, args: String*): String = {
    val (flags, pos) = {
      // reuse Cli's flag parser via reflection-free duplication: simplest is
      // to call run with pre-split args using the same shape the main uses
      var f = Map.empty[String, String]
      var p = List.empty[String]
      var rest = args.toList
      while (rest.nonEmpty) rest match {
        case a :: v :: t if a.startsWith("--") && !v.startsWith("--") =>
          f += a.drop(2) -> v; rest = t
        case a :: t if a.startsWith("--") => f += a.drop(2) -> "true"; rest = t
        case a :: t => p :+= a; rest = t
      }
      (f, p)
    }
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out)) { Cli.run(lh, pos, flags) }
    out.toString
  }

  test("end-to-end CLI session: DDL → DML → query → snapshots → governance") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-").toString)
    runCli(lh, "create-table", "default.emp", "id:long,name:string,salary:double")
    assert(runCli(lh, "tables").contains("default.emp"))
    runCli(lh, "insert", "default.emp",
      """[{"id":1,"name":"Alice","salary":100.0},{"id":2,"name":"Bob","salary":90.0}]""")
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM emp").contains("2"))
    runCli(lh, "update", "default.emp", "id = 2", """{"salary": 95.5}""")
    runCli(lh, "delete", "default.emp", "id = 1")
    val snaps = runCli(lh, "snapshots", "default.emp")
    assert(snaps.linesIterator.size == 3)
    assert(runCli(lh, "query-asof", "default.emp",
      "SELECT count(*) AS n FROM emp", "1").contains("2"))
    runCli(lh, "rollback", "default.emp", "1")
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM emp").contains("2"))
    // governance verbs
    runCli(lh, "tag", "default.emp", "HR")
    assert(runCli(lh, "search", "hr").contains("default.emp"))
    runCli(lh, "mask-set", "name", "hash")
    val masked = runCli(lh, "mask-query", "SELECT name FROM emp LIMIT 1")
    assert(masked.contains("Alice") == false && masked.matches("(?s).*[0-9a-f]{16,}.*"))
    val prof = runCli(lh, "profile", "default.emp")
    assert(prof.contains("rows=2"))
    // describe shows field ids
    assert(runCli(lh, "describe", "default.emp").contains("id=1"))
    // sample fixtures through the CLI
    runCli(lh, "create-samples")
    assert(runCli(lh, "tables").contains("default.expenses"))
    assert(runCli(lh, "suggest-joins").contains("ON a.id = b.id"))
  }

  test("unknown command raises with usage help") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli2-").toString)
    val e = intercept[IllegalArgumentException] {
      runCli(lh, "definitely-not-a-command")
    }
    assert(e.getMessage.contains("unknown command"))
  }
}
