package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WIDE-SCHEMA × DEEP-EVOLUTION rehearsal: EvolutionFuzzSpec proves
  * multi-era reads CORRECT; this measures their cost. Field-id
  * translation runs per file per read, so the two axes that could
  * hurt are column count (C) and schema-era depth (E — a rename before
  * each commit, so every file resolves through a different era). File
  * count and row count are held FIXED across legs; the deltas isolate:
  *
  *   - full-scan count at C=500 vs C=50 — tracks DATA width, fine;
  *   - era depth E=50 vs E=1 at fixed C — must be ~flat: translation
  *     is a per-file column-name mapping, O(C) metadata work, never a
  *     data rewrite;
  *   - a 2-column projection + prunable filter over the widest/deepest
  *     leg — the column-pruning claim: reading 2 of 500 columns must
  *     cost ~the 50-column table's price, NOT 10x (ReadSchema reaches
  *     the parquet scan through the era translation).
  *
  * Run: java … graft.tools.SchemaScale */
object SchemaScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def best[T](reps: Int)(f: => T): Double =
      (1 to reps).map(_ => timed(f)._2).min

    val files = sys.env.getOrElse("SPARK_GRAFT_SCHEMA_FILES", "50").toInt
    val rowsPerFile = 400
    // "cols:eras,cols:eras,…" — eras beyond `files` rename WITHOUT a
    // commit in between, so era depth can exceed file count
    val legs = sys.env.getOrElse("SPARK_GRAFT_SCHEMA_LEGS",
        "50:1,50:50,500:1,500:50")
      .split(",").toSeq.map { s =>
        val Array(c, e) = s.trim.split(":"); (c.toInt, e.toInt)
      }

    for ((c, eras) <- legs) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-ssc-$c-$eras-")
      val cat = graft.core.Catalog.open(spark, wh.toString)
      val cols = ("id" -> "long") +: (1 to c).map(i => s"c$i" -> "long")
      cat.createTable("t", cols, Nil, Map.empty)
      val tbl = cat.loadTable("t")
      // current name of each data column (renames retarget by field-id)
      val names = Array.tabulate(c)(i => s"c${i + 1}")
      // renames per commit: eras == files gives one per file; deeper
      // legs (eras > files) stack several renames between commits, so
      // era DEPTH can scale independently of file count
      val renamesPerFile = if (eras <= 1) 0 else math.max(1, eras / files)
      var renamed = 0
      val (_, buildSec) = timed {
        (0 until files).foreach { f =>
          (0 until renamesPerFile).foreach { _ =>
            val slot = renamed % c
            val nn = s"${names(slot)}x"
            tbl.renameColumn(names(slot), nn)
            names(slot) = nn
            renamed += 1
          }
          val base = spark.range(f * rowsPerFile, (f + 1) * rowsPerFile)
            .toDF("id")
          val wide = base.select(col("id") +:
            names.zipWithIndex.map { case (n, i) =>
              (col("id") * (i + 1)).as(n) }.toSeq: _*)
          tbl.append(wide.coalesce(1))
        }
      }
      assert(tbl.meta.schemas.size == files * renamesPerFile + 1)

      val fullCount = best(3)(tbl.read().count())
      // 2 columns of C, with a bounds-prunable filter (files are
      // id-range-clustered by construction)
      val lastName = names.last
      val narrow = best(3)(tbl
        .prunedRead(col("id") >= (files - 5) * rowsPerFile)
        .select(col("id"), col(lastName))
        .agg(sum(col(lastName))).collect())
      println(s"""{"tool":"SchemaScale","columns":$c,"eras":$eras,""" +
        s""""files":$files,"build_sec":$buildSec,""" +
        s""""full_count_sec":$fullCount,"narrow2_pruned_sec":$narrow}""")
    }
    spark.stop()
  }
}
