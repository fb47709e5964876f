package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: time the sub-stages of a query and print the formatted
  * plan. Usage: runMain graft.tools.Explain <queryName> [sfDir]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q20_jaccard_pairs")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timed] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (name == "q20_pieces") {
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val sh = graft.text.NearDup.shingleTable(docs, "doc_id", "text", 3)
      timed("shingleTable count")(println(sh.count()))
      val shp = sh.persist()
      timed("persist materialize")(println(shp.count()))
      val sizes = shp.groupBy("doc_id").agg(count(lit(1)).as("n"))
      timed("sizes")(println(sizes.count()))
      val pairs = shp.alias("a")
        .join(shp.alias("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      timed("pairs join+agg")(println(pairs.count()))
      pairs.explain("formatted")
    } else {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      timed(s"$name run1")(println(df.count()))
      timed(s"$name run2")(println(fn(spark, sfDir).count()))
      df.explain("formatted")
    }
    spark.stop()
  }
}
