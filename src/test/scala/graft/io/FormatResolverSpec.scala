package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.{Lakehouse, SparkFixture}

class FormatResolverSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("resolution chain: override > table property > per-table > global > parquet") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-fmt-").toString)
    lh.catalog.createTable("t", Seq("id" -> "long"), Nil, Map.empty)
    assert(lh.formats.resolve("default.t") == "parquet")
    lh.formats.setGlobalFormat("vortex")
    assert(lh.formats.resolve("default.t") == "vortex")
    lh.formats.setTableFormat("default.t", "parquet")
    assert(lh.formats.resolve("default.t") == "parquet")
    lh.catalog.loadTable("t").setProperty("write.format.default", "vortex")
    assert(lh.formats.resolve("default.t") == "vortex")
    assert(lh.formats.resolve("default.t", Some("parquet")) == "parquet")
    intercept[IllegalArgumentException](lh.formats.setGlobalFormat("orc"))
    assert(lh.formats.writerOptions("vortex") == Map("compression" -> "zstd"))
  }

  test("vortex-labeled table writes zstd parquet that round-trips") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-fmt2-").toString)
    lh.catalog.createTable("v", Seq("id" -> "long", "s" -> "string"), Nil,
      Map("write.format.default" -> "vortex"))
    val df = (1 to 1000).map(i => (i.toLong, s"value_$i")).toDF("id", "s")
    lh.catalog.loadTable("v").append(df)
    val back = lh.catalog.loadTable("v").read()
    assert(back.count() == 1000)
    // files really use the zstd codec
    val file = lh.catalog.loadTable("v").currentSnapshot.get.files.head.path
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val codecs = footer.getFooter.getBlocks.get(0).getColumns.get(0).getCodec
      assert(codecs.toString.toLowerCase == "zstd")
    } finally footer.close()
  }
}
