package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.SparkFixture

class IceTableSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newCatalog() =
    Catalog.open(spark, SparkFixture.tmpDir("graft-wh-").toString)

  private val expensesCols = Seq(
    "id" -> "long", "date" -> "date", "category" -> "string",
    "description" -> "string", "amount" -> "double", "currency" -> "string")

  private def sampleRows = Seq(
    (1L, "2025-11-15", "groceries", "Weekly shopping", 85.5, "USD"),
    (2L, "2025-11-20", "transport", "Uber ride", 15.99, "USD"),
    (3L, "2025-12-01", "entertainment", "Cinema", 30.0, "USD"),
    (4L, "2025-12-05", "groceries", "More shopping", 120.0, "USD"))

  private def sampleDf = sampleRows
    .toDF("id", "date", "category", "description", "amount", "currency")
    .withColumn("date", org.apache.spark.sql.functions.to_date($"date"))

  test("namespace CRUD: create, list, refuse non-empty drop") {
    val cat = newCatalog()
    assert(cat.listNamespaces() == List("default"))
    cat.createNamespace("fin", Map("owner" -> "me"))
    assert(cat.listNamespaces() == List("default", "fin"))
    assert(cat.namespaceProperties("fin")("owner") == "me")
    cat.createTable("fin.t", expensesCols, Nil, Map.empty)
    val err = intercept[IllegalArgumentException](cat.dropNamespace("fin"))
    assert(err.getMessage.contains("not empty"))
    cat.dropTable("fin.t")
    cat.dropNamespace("fin")
    assert(cat.listNamespaces() == List("default"))
  }

  test("create/append/read round-trip with field-ids") {
    val cat = newCatalog()
    val tbl = cat.createTable("expenses", expensesCols, Nil, Map.empty)
    assert(tbl.read().count() == 0)
    tbl.append(sampleDf)
    val back = tbl.read()
    assert(back.count() == 4)
    assert(back.columns.toSeq == expensesCols.map(_._1))
    // int widened to long, float to double per reference TYPE_MAP
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("amount").dataType.typeName == "double")
    // stable field ids assigned 1..n
    assert(TableMeta.fieldId(back.schema("id")) == Some(1L))
    assert(TableMeta.fieldId(back.schema("currency")) == Some(6L))
    assert(cat.listTables() == List("default.expenses"))
  }

  test("snapshots: append/overwrite lineage + time travel by id and timestamp") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", expensesCols, Nil, Map.empty)
    tbl.append(sampleDf)
    tbl.append(sampleDf.where($"category" === "groceries"))
    tbl.overwrite(sampleDf.limit(1))
    val snaps = tbl.snapshots
    assert(snaps.map(_.operation) == List("append", "append", "overwrite"))
    assert(snaps.map(_.parentId) == List(None, Some(1L), Some(2L)))
    assert(tbl.read().count() == 1)
    assert(tbl.readAsOf("1").count() == 4)
    assert(tbl.readAsOf("2").count() == 6)
    // timestamp-based travel: at snapshot 2's commit time we see 6 rows
    val ts2 = java.time.Instant.ofEpochMilli(snaps(1).timestampMs).toString
    assert(tbl.readAsOf(ts2).count() == 6)
    assert(snaps(1).totalRows == 6)
  }

  test("rollback preserves history; expire never drops current") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", expensesCols, Nil, Map.empty)
    tbl.append(sampleDf)          // 1: 4 rows
    tbl.overwrite(sampleDf.limit(2)) // 2: 2 rows
    tbl.rollbackTo("1")           // 3: 4 rows again, zero-copy
    assert(tbl.read().count() == 4)
    assert(tbl.snapshots.size == 3)
    val expired = tbl.expireSnapshots(retainLast = Some(1))
    assert(expired == List(1L, 2L))
    assert(tbl.snapshots.map(_.id) == List(3L))
    assert(tbl.read().count() == 4) // current still readable (files shared)
  }

  test("partition transforms: month dir layout + stats + manifest pruning") {
    val cat = newCatalog()
    val tbl = cat.createTable("e", expensesCols, Seq("month(date)"), Map.empty)
    tbl.append(sampleDf)
    val stats = tbl.partitionStats
    assert(stats.keySet == Set("_p_date_month=2025-11", "_p_date_month=2025-12"))
    assert(stats.values.map(_._2).sum == 4)
    // logical schema untouched by partitioning
    assert(tbl.read().columns.toSeq == expensesCols.map(_._1))
    val pruned = tbl.prunedRead(pv => pv.get("_p_date_month").contains("2025-11"))
    assert(pruned.count() == 2)
    // bucket + truncate + year parse
    Seq("bucket(8,id)", "truncate(3,category)", "year(date)", "identity(currency)")
      .foreach(PartitionTransform.parse)
  }

  test("truncate transform: integral floors to multiple of n, string prefixes") {
    val cat = newCatalog()
    val tbl = cat.createTable("tr",
      Seq("id" -> "long", "cat" -> "string"), Seq("truncate(10,id)"), Map.empty)
    tbl.append(Seq((3L, "a"), (12L, "b"), (-7L, "c"), (20L, "d"))
      .toDF("id", "cat"))
    // Iceberg semantics: -7 floors to -10, 3 to 0, 12 to 10, 20 to 20
    assert(tbl.partitionStats.keySet ==
      Set("_p_id_trunc=0", "_p_id_trunc=10", "_p_id_trunc=20", "_p_id_trunc=-10"))
    val str = cat.createTable("trs",
      Seq("id" -> "long", "cat" -> "string"), Seq("truncate(2,cat)"), Map.empty)
    str.append(Seq((1L, "alpha"), (2L, "already")).toDF("id", "cat"))
    assert(str.partitionStats.keySet == Set("_p_cat_trunc=al"))
  }

  test("schema evolution: add/rename/drop resolve by field-id across old files") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", expensesCols, Nil, Map.empty)
    tbl.append(sampleDf)
    tbl.renameColumn("amount", "cost")
    tbl.addColumn("notes", "string")
    val afterRename = tbl.read()
    assert(afterRename.columns.toSeq ==
      Seq("id", "date", "category", "description", "cost", "currency", "notes"))
    // old files still serve renamed column values by field-id
    assert(afterRename.agg(org.apache.spark.sql.functions.sum($"cost")).head.getDouble(0) == 251.49)
    assert(afterRename.where($"notes".isNull).count() == 4)
    // write under the new schema, then read mixed-version files
    tbl.append(afterRename.limit(1).withColumn("notes",
      org.apache.spark.sql.functions.lit("hello")))
    assert(tbl.read().count() == 5)
    assert(tbl.read().where($"notes" === "hello").count() == 1)
    tbl.dropColumn("description")
    assert(!tbl.read().columns.contains("description"))
    assert(tbl.read().count() == 5)
  }

  test("add after drop never resurrects the dropped column's data") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", expensesCols, Nil, Map.empty)
    tbl.append(sampleDf)
    tbl.dropColumn("description")
    // the new column must get a FRESH field-id, not description's: reusing
    // it would resolve old files' description values into the new column
    tbl.addColumn("remark", "string")
    val ids = tbl.schema.fields.flatMap(graft.core.TableMeta.fieldId)
    assert(ids.distinct.length == ids.length)
    val droppedId = cat.loadTable("t").meta.schemas.head.struct.fields
      .find(_.name == "description").flatMap(graft.core.TableMeta.fieldId).get
    val remarkId = tbl.schema.fields.find(_.name == "remark")
      .flatMap(graft.core.TableMeta.fieldId).get
    assert(remarkId != droppedId)
    // old files therefore serve NULL for the new column, not old data
    assert(tbl.read().where($"remark".isNotNull).count() == 0)
    // manifest pruning resolves old files by field-id too (renamed column)
    tbl.renameColumn("category", "kind")
    val pruned = tbl.prunedRead(_ => true)
    assert(pruned.where($"kind".isNotNull).count() == 4)
  }

  test("orphan files detected after expire; compact rewrites to one file") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", expensesCols, Nil, Map.empty)
    tbl.append(sampleDf)
    tbl.overwrite(sampleDf.limit(1))
    tbl.expireSnapshots(retainLast = Some(1))
    val orphans = tbl.orphanFiles()
    // expired snapshot 1 strands its data files AND its manifest JSON
    assert(orphans.nonEmpty && orphans.forall(p =>
      p.contains("commit-00001") || p.contains("00001") && p.endsWith(".json")))
    tbl.orphanFiles(delete = true)
    assert(tbl.orphanFiles().isEmpty)
    assert(tbl.read().count() == 1)
    tbl.append(sampleDf)
    val snap = tbl.compact(targetFiles = 1)
    assert(snap.operation == "replace" && snap.files.size == 1)
    assert(tbl.read().count() == 5)
  }

  test("properties and type-name parsing") {
    val cat = newCatalog()
    val tbl = cat.createTable("t", expensesCols, Nil, Map("k" -> "v"))
    assert(tbl.meta.properties("k") == "v")
    tbl.setProperty("write.format.default", "parquet")
    assert(tbl.meta.properties("write.format.default") == "parquet")
    tbl.removeProperty("k")
    assert(!tbl.meta.properties.contains("k"))
    intercept[IllegalArgumentException](TableMeta.parseTypeName("varchar"))
  }
}
