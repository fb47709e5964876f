package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WAREHOUSE-scale rehearsal: where ChangesScale measures commit-history
  * length, this measures the CATALOG dimension — table count. A shared
  * production warehouse is 10k+ tables; per-table operations must not
  * pay O(catalog):
  *
  *   1. loadTable — one dir probe + one JSON read, flat by design;
  *   2. execute() with per-query lazy registration — the design claim
  *      is O(referenced tables), NOT O(catalog) (the reference
  *      re-registers the whole catalog per query, query.py:52-75);
  *   3. renameTable through the Lakehouse (store followers included) —
  *      O(table metadata + store entries), never a catalog scan;
  *   4. dropTable of a zero-copy clone — the reverse-pointer pin
  *      release's O(1) claim;
  *   5. createTable at catalog size N — flat;
  *   6. listTables — legitimately O(catalog), the anti-claim row (one
  *      directory listing per namespace; cheap linear, never quadratic).
  *
  * Run: java … graft.tools.CatalogScale
  * Prints one JSON line per table count; ratios land in SCALING.md.
  * Measured queries take the MIN of reps (builds single-pass). */
object CatalogScale {
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

    val ns = sys.env.getOrElse("SPARK_GRAFT_TABLES", "100,1000,10000")
      .split(",").map(_.trim.toInt).toSeq

    for (n <- ns) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-ctsc-$n-")
      val lh = graft.Lakehouse.open(spark, wh.toString)
      val schema = Seq("id" -> "long", "v" -> "string")
      val (_, buildSec) = timed {
        (0 until n).foreach { i =>
          lh.catalog.createTable(s"default.t$i", schema, Nil, Map.empty)
        }
      }
      // data in the measured tables only — the catalog DIMENSION is what
      // varies; per-table data volume is ScaleExponent's axis
      val rows = (0 until 600).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      val t0 = lh.catalog.loadTable("default.t0")
      (0 until 3).foreach { b =>
        t0.append(rows.where(col("id") >= b * 200 &&
          col("id") < (b + 1) * 200).coalesce(1))
      }

      val listSec = best(3)(lh.catalog.listTables("*").size)
      val loadSec = best(5)(lh.catalog.loadTable("default.t0"))
      // warm once (first execute pays one-time analyzer init), then min
      lh.engine.execute("SELECT count(*) AS n FROM t0 WHERE id >= 400", 0)
        .collect()
      val execSec = best(5)(lh.engine.execute(
        "SELECT count(*) AS n FROM t0 WHERE id >= 400", 0).collect())
      // rename through the FACADE: catalog move + every store follower
      val renameSec = timed(
        lh.renameTable("default.t1", "default.t1r"))._2
      // zero-copy clone drop: reverse-pointer pin release must be O(1)
      lh.catalog.cloneTableZeroCopy("default.t0", "default.t0c")
      val dropCloneSec = timed(lh.catalog.dropTable("default.t0c"))._2
      val createSec = timed(lh.catalog.createTable(
        s"default.t_extra", schema, Nil, Map.empty))._2

      println(s"""{"tool":"CatalogScale","tables":$n,""" +
        s""""build_sec":$buildSec,"list_sec":$listSec,""" +
        s""""load_sec":$loadSec,"execute_sec":$execSec,""" +
        s""""rename_sec":$renameSec,"drop_clone_sec":$dropCloneSec,""" +
        s""""create_sec":$createSec}""")
    }
    spark.stop()
  }
}
