package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Differential fuzz of the `changes` SQL metadata face and its
  * `_commit_id` bound handling: a random commit sequence (append, MoR
  * delete/update, compaction, overwrite, rollback) is mirrored by a pure
  * in-memory model whose per-commit delta is the STATE DIFF — the
  * invariant every replay kind must satisfy (an update is delete+insert,
  * a compaction is empty, an overwrite/rollback is the full diff). Then
  * random reads through the face — from_id/to_id options × WHERE
  * `_commit_id` predicates of every comparison shape — must equal the
  * model fold over the same range. After expiring a random prefix:
  * WHERE-bounded queries over retained commits keep answering, the
  * unbounded face refuses, and an EXPLICIT expired from_id refuses even
  * when a WHERE bound would make the pushed range valid (the
  * offset-consumer contract the pushdown must never waive).
  * Deterministic seeds. */
class ChangesFaceFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private type Row2 = (Long, String)
  private case class Delta(inserts: Seq[Row2], deletes: Seq[Row2])

  private lazy val catName = s"cff${System.nanoTime() % 100000}"
  private lazy val lh = {
    val wh = SparkFixture.tmpDir("graft-cff-")
    val l = graft.Lakehouse.open(spark, wh.toString)
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
    l.catalog.createNamespace("fz")
    l
  }

  private def diff(before: Map[Long, String],
      after: Map[Long, String]): Delta = Delta(
    inserts = (after.toSet -- before.toSet).toSeq,
    deletes = (before.toSet -- after.toSet).toSeq)

  test("random commit histories: the changes face under every bound " +
      "shape equals the state-diff model; expiry honors filter-vs-offset " +
      "semantics") {
    run(19101L)
  }

  test("random commit histories, second seed: a different interleaving " +
      "of rollbacks/overwrites/compactions through the same invariants") {
    run(19117L)
  }

  private def run(seed: Long): Unit = {
    val rng = new scala.util.Random(seed)
    val tname = s"fz.t$seed"
    lh.catalog.createTable(tname,
      Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)
    val tbl = lh.catalog.loadTable(tname)

    var nextId = 0L
    var state = Map.empty[Long, String]
    // commit id -> state diff at that commit
    var deltas = Map.empty[Long, Delta]
    def headId = tbl.currentSnapshot.map(_.id).getOrElse(0L)

    def recordCommit(newState: Map[Long, String]): Unit = {
      val before = state
      state = newState
      // ops that matched nothing may not commit — only record real heads
      val h = headId
      if (!deltas.contains(h) && h > 0)
        deltas += h -> diff(before, newState)
    }

    def batch(n: Int): Seq[Row2] =
      (0 until n).map { _ => nextId += 1; (nextId, s"v${rng.nextInt(9)}") }

    // seed commit
    val b0 = batch(10)
    tbl.append(b0.toDF("id", "v").coalesce(1))
    recordCommit(state ++ b0)

    for (_ <- 1 to 22) {
      rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 =>
          val b = batch(2 + rng.nextInt(5))
          tbl.append(b.toDF("id", "v").coalesce(1))
          recordCommit(state ++ b)
        case 4 | 5 =>
          if (state.nonEmpty) {
            val ks = state.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            tbl.deleteWhereMor(col("id") === k)
            recordCommit(state - k)
          }
        case 6 =>
          if (state.nonEmpty) {
            val ks = state.keys.toSeq.sorted
            val k = ks(rng.nextInt(ks.size))
            val nv = s"u${rng.nextInt(99)}"
            tbl.updateWhereMor(col("id") === k, Map("v" -> lit(nv)))
            recordCommit(state + (k -> nv))
          }
        case 7 =>
          tbl.compact(targetFiles = 1 + rng.nextInt(2))
          recordCommit(state) // live rows preserved: empty delta
        case 8 =>
          val b = batch(3 + rng.nextInt(4))
          tbl.overwrite(b.toDF("id", "v"))
          recordCommit(b.toMap)
        case 9 =>
          val snaps = tbl.rawLog.map(_.id)
          if (snaps.size > 2) {
            val target = snaps(rng.nextInt(snaps.size - 1))
            tbl.rollbackTo(target.toString)
            // model re-derives the rolled-back state by folding deltas up
            // to the target commit (the deltas ARE the ground truth here)
            val till = deltas.toSeq.filter(_._1 <= target).sortBy(_._1)
            val rolled = till.foldLeft(Map.empty[Long, String]) {
              case (m, (_, d)) =>
                (m -- d.deletes.map(_._1)) ++ d.inserts
            }
            recordCommit(rolled)
          }
      }
    }

    val head = headId
    val sqlTable = s"$catName.$tname.changes"

    // expected rows for a commit range + optional commit-id predicate
    def expected(lo: Option[Long], hi: Option[Long],
        keep: Long => Boolean): Seq[(Long, String, Long, String)] =
      deltas.toSeq.sortBy(_._1)
        .filter { case (c, _) => lo.forall(c > _) && hi.forall(c <= _) }
        .filter { case (c, _) => keep(c) }
        .flatMap { case (c, d) =>
          d.inserts.map(r => (c, "insert", r._1, r._2)) ++
            d.deletes.map(r => (c, "delete", r._1, r._2))
        }.sorted

    def got(reader: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, String)] =
      reader.select(col("_commit_id"), col("_change_type"),
          col("id"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
        .toSeq.sorted

    // ---- phase 1: all commits retained — every bound shape matches ----
    for (i <- 1 to 25) {
      val from = if (rng.nextBoolean()) Some(rng.nextLong(head) + 1) else None
      val to = if (rng.nextBoolean()) Some(rng.nextLong(head) + 1) else None
      var r = spark.read
      from.foreach(f => r = r.option("from_id", f.toString))
      to.foreach(t => r = r.option("to_id", t.toString))
      val base = r.table(sqlTable)
      val (whereSql, keep): (Option[String], Long => Boolean) =
        rng.nextInt(6) match {
          case 0 => (None, _ => true)
          case 1 => val x = rng.nextLong(head) + 1
            (Some(s"_commit_id > $x"), _ > x)
          case 2 => val x = rng.nextLong(head) + 1
            (Some(s"_commit_id >= $x"), _ >= x)
          case 3 => val x = rng.nextLong(head) + 1
            (Some(s"_commit_id = $x"), _ == x)
          case 4 => val x = rng.nextLong(head) + 1
            (Some(s"_commit_id <= $x"), _ <= x)
          case 5 =>
            val a = rng.nextLong(head) + 1
            val b = a + rng.nextInt(3)
            (Some(s"_commit_id BETWEEN $a AND $b"), c => c >= a && c <= b)
        }
      val q = whereSql.map(base.where).getOrElse(base)
      assert(got(q) == expected(from, to.orElse(Some(head)), keep),
        s"query $i diverged (from=$from to=$to where=$whereSql)")
    }

    // ---- phase 2: expire a prefix — filter vs offset semantics --------
    val retained0 = tbl.rawLog.map(_.id)
    val keepN = 3 + rng.nextInt(3)
    tbl.expireSnapshots(retainLast = Some(keepN))
    val retained = tbl.rawLog.map(_.id)
    assert(retained.size <= keepN)
    val oldestRetained = retained.min
    // replays still need each commit's PARENT entry: bounds must start
    // strictly after the oldest retained commit
    val safeLo = oldestRetained

    if (retained0.size > retained.size && safeLo < head) {
      // unbounded face refuses loudly (must replay expired commits)
      val e = intercept[Exception](
        spark.sql(s"SELECT COUNT(*) FROM $sqlTable").collect())
      assert(e.getMessage.contains("expired"), s"got: ${e.getMessage}")
      // WHERE-bounded queries over fully retained ranges keep answering
      for (_ <- 1 to 8) {
        val lo = safeLo + rng.nextLong(head - safeLo)
        val gotRows = got(spark.sql(
          s"SELECT * FROM $sqlTable WHERE _commit_id > $lo"))
        assert(gotRows == expected(Some(lo), Some(head), _ => true),
          s"bounded query diverged after expiry (lo=$lo)")
      }
      // an EXPLICIT expired from_id refuses even with a valid WHERE bound
      val expiredFrom = (retained0.toSet -- retained.toSet).min
      val e2 = intercept[Exception](
        spark.read.option("from_id", expiredFrom.toString)
          .table(sqlTable).where(s"_commit_id > $safeLo").count())
      assert(e2.getMessage.contains("expired"),
        s"expired from_id must refuse regardless of WHERE: ${e2.getMessage}")
      // …while a RETAINED from_id composes with the same WHERE bound
      val gotRows = got(spark.read.option("from_id", oldestRetained.toString)
        .table(sqlTable).where(s"_commit_id > $safeLo"))
      assert(gotRows == expected(Some(math.max(oldestRetained, safeLo)),
        Some(head), _ => true))
    }
  }
}
