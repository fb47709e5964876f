package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 60-doc chain: (i, i+1)
    val pairs = (0 until 59).map(i => (i.toLong + 900000L, i.toLong + 900001L))
      .toDF("id_a", "id_b")
    // count rounds via listener on ckpt jobs? simpler: binary-search maxIter
    def convergedAt(maxIter: Int): Boolean = {
      val comps = graft.text.NearDup.duplicateComponents(pairs, maxIter)
      val ok = comps.groupBy("component").count().count() == 1
      ok
    }
    (1 to 8).foreach { k =>
      println(s"maxIter=$k converged=${convergedAt(k)}")
    }
    spark.stop()
  }
}
