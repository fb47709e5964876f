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

  test("ORC export/import round-trips values exactly (types, nulls, arrays)") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-orc-").toString)
    val ie = new ImportExport(lh)
    val df = (1 to 500).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"text_$i", i * 0.25,
        java.sql.Timestamp.valueOf(s"2026-01-01 00:0${i % 6}:00"))
    }.toDF("id", "s", "x", "ts")
    lh.catalog.createTable("orcsrc", df.schema, Nil, Map.empty)
    lh.catalog.loadTable("orcsrc").append(df)
    val out = SparkFixture.tmpDir("graft-orc-out-").toString + "/data.orc"
    val n = ie.exportTable("default.orcsrc", out, format = "orc")
    assert(n == 500)
    assert(ie.detectFormat(out) == "orc")
    val back = ie.readFile(out)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val orig = df.collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == orig)
    // import path: ORC file -> new table
    val imported = ie.importFile(out, "orcdst", format = Some("orc"))
    assert(imported == 500)
    assert(lh.catalog.loadTable("orcdst").read().count() == 500)
  }
}
