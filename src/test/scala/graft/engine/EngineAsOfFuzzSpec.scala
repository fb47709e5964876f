package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Differential fuzz of the time-travel SQL path (QueryEngine.executeAsOf):
  * for random refs (snapshot ids and tags) over a multi-commit history
  * with MoR state, the NAMED table must resolve at the requested
  * snapshot while every OTHER referenced table resolves CURRENT, and the
  * current view must be RESTORED after each call — interleaved execute()
  * calls assert a stale asof binding never leaks into later queries
  * (the exact protocol executeAsOf's register-last/restore-finally
  * choreography claims). Hand-written cases pin single shapes
  * (EnginePruningSpec); this hunts ref × shape × interleaving
  * compositions. Deterministic seed. */
class EngineAsOfFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("seed 9401: random refs and query shapes through executeAsOf — " +
      "named table time-travels, join partners stay current, current " +
      "views always restored") {
    val rng = new scala.util.Random(9401L)
    val lh = graft.Lakehouse.open(spark,
      SparkFixture.tmpDir("graft-eaf-").toString)
    def vdf(r: Range) = r.map(i => (i.toLong, s"n$i")).toDF("id", "v")
    val ta = lh.catalog.createTable("default.fa9401",
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    ta.append(vdf(0 until 100)) // 1
    ta.append(vdf(100 until 200)) // 2
    ta.deleteWhereMor(col("id") % 7 === 0) // 3
    ta.append(vdf(200 until 300)) // 4
    ta.updateWhereMor(col("id") === 5L, Map("v" -> lit("upd"))) // 5
    ta.append(vdf(300 until 350)) // 6
    ta.tagSnapshot("mid", Some("3")) // a named ref into the history
    val tb = lh.catalog.createTable("default.fb9401",
      Seq("id" -> "long", "w" -> "long"), Nil, Map.empty)
    tb.append((0 until 400 by 2).map(i => (i.toLong, (i % 13).toLong))
      .toDF("id", "w"))

    val head = ta.currentSnapshot.get.id
    val currentCount = ta.read().count()
    for (i <- 1 to 20) {
      val ref =
        if (rng.nextInt(5) == 0) "mid"
        else (1 + rng.nextInt(head.toInt)).toString
      val sql = rng.nextInt(3) match {
        case 0 => s"SELECT count(*) AS n, sum(a.id) AS s FROM fa9401 a " +
          s"WHERE a.id % ${2 + rng.nextInt(5)} = 0"
        case 1 => // join partner must read CURRENT regardless of the ref
          s"SELECT count(*) AS n, sum(b.w) AS sw FROM fa9401 a " +
            s"JOIN fb9401 b ON a.id = b.id WHERE a.id >= ${rng.nextInt(300)}"
        case 2 => s"SELECT a.id, a.v FROM default.fa9401 a " +
          s"WHERE a.id < ${rng.nextInt(350)} AND a.id % 3 = 1"
      }
      val got = lh.engine.executeAsOf("default.fa9401", sql, ref, 0)
        .collect().map(_.mkString("|")).sorted.toSeq
      // oracle: the asof frame + the CURRENT partner as plain views
      ta.readAsOf(ref).createOrReplaceTempView("oaf9401")
      tb.read().createOrReplaceTempView("obf9401")
      val want = spark.sql(sql.replace("default.fa9401", "oaf9401")
          .replace("fa9401", "oaf9401").replace("fb9401", "obf9401")
          .replace("oaf9401 a", "oaf9401 a")) // idempotent; keep simple
        .collect().map(_.mkString("|")).sorted.toSeq
      assert(got == want,
        s"asof divergence (i=$i ref=$ref):\n$sql\n" +
          s"got ${got.size} rows, want ${want.size}")
      // the CURRENT view must be restored — through DIRECT spark.sql,
      // not engine.execute (which re-registers referenced tables per
      // query and would mask a missing restore; mutation-checked:
      // removing executeAsOf's finally-restore fails exactly here)
      if (i % 3 == 0)
        assert(spark.sql("SELECT count(*) AS n FROM fa9401")
          .head.getLong(0) == currentCount,
          s"asof binding leaked to direct spark.sql after ref=$ref")
    }
  }
}
