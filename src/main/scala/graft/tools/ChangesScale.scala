package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** METADATA-scale rehearsal: where ScaleExponent measures data volume,
  * this measures COMMIT-HISTORY length — the dimension a long-lived
  * production table grows in even when its data doesn't (a streaming
  * sink at one commit/minute passes 500k commits/year). Builds the same
  * table at N and 10N commits and measures:
  *
  *   1. per-commit cost at the END of history vs the START — the
  *      manifest-list design's O(new files) claim: committing to a
  *      10x-longer log must not cost more;
  *   2. unbounded changelog replay — legitimately O(history);
  *   3. a BOUNDED tail replay through the SQL face with a `_commit_id`
  *      WHERE bound — the `__pushed_lo` pushdown's claim: cost must
  *      track the RANGE, not the history (flat across N);
  *   4. head resolution (read().count()) — must be flat: reading the
  *      current state of a 100k-commit table cannot replay its past.
  *
  * Run: java … graft.tools.ChangesScale
  * Prints one JSON line per (N) with the four measurements; ratios land
  * in SCALING.md. Timings on this box are noisy — each measured query
  * takes the MIN of 3 reps (builds are single-pass, unavoidable). */
object ChangesScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def best[T](reps: Int)(f: => T): Double =
      (1 to reps).map(_ => timed(f)._2).min

    val ns = sys.env.getOrElse("SPARK_GRAFT_COMMITS", "40,400")
      .split(",").map(_.trim.toInt).toSeq

    for (n <- ns) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-chsc-$n-")
      val cat = graft.core.Catalog.open(spark, wh.toString)
      val catName = s"chsc$n"
      spark.conf.set(s"spark.sql.catalog.$catName",
        classOf[graft.engine.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh.toString)
      val tbl = cat.createTable("t",
        Seq("id" -> "long", "v" -> "string"), Nil, Map.empty)

      // build history: small appends with a MoR delete every 7th commit —
      // time the first and last 5 appends to compare commit cost across
      // history length
      var next = 0L
      def appendOne(): Double = {
        val b = (0 until 200).map { _ => next += 1; (next, s"v$next") }
        timed(tbl.append(b.toDF("id", "v").coalesce(1)))._2
      }
      val firstCosts = (1 to 5).map(_ => appendOne())
      var committed = 5
      while (committed < n - 5) {
        if (committed % 7 == 0)
          tbl.deleteWhereMor(col("id") === (next - 100))
        else appendOne()
        committed += 1
      }
      val lastCosts = (1 to 5).map(_ => appendOne())
      val head = tbl.currentSnapshot.get.id

      val commitEarly = firstCosts.min
      val commitLate = lastCosts.min
      val unbounded = best(3)(
        graft.streaming.Changelog.changesBetween(tbl, None, head).count())
      val boundedTail = best(3)(spark.sql(
        s"SELECT COUNT(*) FROM $catName.default.t.changes " +
          s"WHERE _commit_id > ${head - 10}").collect())
      val headRead = best(3)(tbl.read().count())

      println(s"""{"tool":"ChangesScale","commits":$head,""" +
        s""""commit_early_sec":$commitEarly,"commit_late_sec":$commitLate,""" +
        s""""unbounded_replay_sec":$unbounded,""" +
        s""""bounded_tail10_sec":$boundedTail,"head_read_sec":$headRead}""")
    }
    spark.stop()
  }
}
