package graft.governance

import org.scalatest.funsuite.AnyFunSuite
import graft.{Lakehouse, SparkFixture}

class GovernanceSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def seeded(): Lakehouse = {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-gov-").toString)
    lh.catalog.createTable("users",
      Seq("id" -> "long", "email" -> "string", "plan" -> "string", "age" -> "double"),
      Nil, Map.empty)
    lh.dml.insertRows("users", (1 to 30).map(i => Map[String, Any](
      "id" -> i, "email" -> s"user$i@example.com",
      "plan" -> (if (i % 3 == 0) "pro" else "free"), "age" -> (20.0 + i % 40))))
    lh
  }

  test("dashboard: per-table health rollup, sizes, activity and query counts") {
    val lh = seeded()
    // no stats cached yet → table is Stale regardless of files/orphans
    val r0 = lh.dashboard.report()
    assert(r0.totalTables == 1 && r0.namespaces == List("default"))
    assert(r0.tables.head.health == "Stale")
    assert(r0.tables.head.rows == 30)
    assert(r0.totalSizeBytes == r0.tables.map(_.sizeBytes).sum && r0.totalSizeBytes > 0)

    // fresh stats → healthy; few files → Good
    lh.profile.computeStats("default.users")
    val r1 = lh.dashboard.report()
    assert(r1.tables.head.health == "Good")
    assert(r1.tables.head.sizeDisplay.endsWith("B"))

    // ≥10 data files → Compact (precedence below Stale/Orphans)
    (1 to 10).foreach(i => lh.dml.insertRows("users",
      Seq(Map[String, Any]("id" -> (100 + i), "email" -> s"x$i@e.com",
        "plan" -> "free", "age" -> 30.0))))
    lh.profile.computeStats("default.users")
    val r2 = lh.dashboard.report()
    assert(r2.tables.head.dataFiles >= 10 && r2.tables.head.health == "Compact")
    assert(r2.tables.head.rows == 40)

    // audit activity + saved-query counts surface in the rollup
    lh.savedQueries.save("q", "SELECT 1")
    val r3 = lh.dashboard.report()
    assert(r3.recentActivity.nonEmpty && r3.recentActivity.size <= 5)
    assert(r3.savedQueriesCount == 1)

    // size formatting boundaries (dashboard.py:9-18)
    assert(lh.dashboard.formatSize(512) == "512 B")
    assert(lh.dashboard.formatSize(2048) == "2.0 KB")
    assert(lh.dashboard.formatSize(3 * 1024 * 1024) == "3.0 MB")
    assert(lh.dashboard.formatSize(5L * 1024 * 1024 * 1024) == "5.0 GB")
    // health precedence
    assert(lh.dashboard.tableHealth(3, 0, isStale = true) == "Stale")
    assert(lh.dashboard.tableHealth(3, 2, isStale = false) == "Orphans")
    assert(lh.dashboard.tableHealth(12, 0, isStale = false) == "Compact")
    assert(lh.dashboard.tableHealth(3, 0, isStale = false) == "Good")
  }

  test("masking: column-global policies applied to result frames + preview") {
    val lh = seeded()
    lh.masking.setPolicy(MaskingPolicy("email", "hash"))
    lh.masking.setPolicy(MaskingPolicy("age", "nullify"))
    lh.masking.setPolicy(MaskingPolicy("plan", "truncate", Map("length" -> "2")))
    val masked = lh.masking.apply(lh.catalog.loadTable("users").read())
    val r = masked.where($"id" === 1).head
    assert(r.getString(1).matches("[0-9a-f]{64}"))
    assert(r.isNullAt(3))
    assert(r.getString(2) == "fr")
    val prev = lh.masking.preview(lh.catalog.loadTable("users").read(), 2)
    assert(prev.size == 2 && prev.head._1.getString(1) != prev.head._2.getString(1))
    lh.masking.dropPolicy("age")
    assert(!lh.masking.policies().contains("age"))
  }

  test("sla: violations and warnings at 90% threshold") {
    val lh = seeded()
    lh.sla.setPolicy(SlaPolicy("default.users", minRowCount = Some(100)))
    val v = lh.sla.check("default.users")
    assert(v.exists(x => x.check == "row_count" && x.level == "violation"))
    lh.sla.setPolicy(SlaPolicy("default.users", minRowCount = Some(10),
      maxStalenessHours = Some(1000.0)))
    assert(lh.sla.check("default.users").isEmpty)
    assert(lh.sla.history("default.users").size == 2)
  }

  test("contracts: versioning, validation, compliance, auto-generation") {
    val lh = seeded()
    val generated = lh.contracts.generateFromProfile("default.users")
    // auto-gen: all columns non-null → not_null constraints; plan has 2
    // values ≤ 20 distinct → enum; age numeric → range with 10% buffer
    assert(generated.constraints.exists(c => c.kind == "not_null" && c.column == "id"))
    assert(generated.constraints.exists(c => c.kind == "enum" && c.column == "plan" &&
      c.values.toSet == Set("free", "pro")))
    val range = generated.constraints.find(c => c.kind == "range" && c.column == "age").get
    assert(range.params("min").toDouble < 21.0 && range.params("max").toDouble > 50.0)

    val created = lh.contracts.create(generated)
    assert(created.version == 1)
    val report = lh.contracts.monitor("default.users")
    assert(report.schemaScore == 1.0 && report.constraintScore == 1.0)
    assert(report.score > 0.8)

    // violate the enum constraint → monitor catches it
    lh.dml.insertRows("users", Seq(Map("id" -> 99, "email" -> "x@y.z",
      "plan" -> "enterprise", "age" -> 30.0)))
    val report2 = lh.contracts.monitor("default.users")
    assert(report2.constraintScore < 1.0)
    assert(lh.contracts.complianceHistory("default.users").size == 2)
    assert(lh.contracts.trend("default.users").size == 2)

    // update bumps version + snapshots history
    val v2 = lh.contracts.update(created.copy(constraints =
      created.constraints.filterNot(_.kind == "enum")))
    assert(v2.version == 2)
    assert(lh.contracts.history("default.users").map(_.version) == List(1))
    // pre-write row validation
    val bad = Seq((100L, "a@b.c", "free", -500.0)).toDF("id", "email", "plan", "age")
    assert(lh.contracts.validateRows("default.users", bad).exists(!_.passed))
    assert(lh.contracts.coverage()("covered") == 1)
  }

  test("tagging + catalog metadata + glossary search") {
    val lh = seeded()
    lh.tagging.addTag("default.users", "PII")
    lh.tagging.addTag("default.users", "core")
    assert(lh.tagging.tags("default.users") == List("pii", "core"))
    lh.tagging.setDescription("default.users", "All user accounts")
    lh.tagging.bookmark("default.users")
    assert(lh.tagging.search("pii") == List("default.users"))
    assert(lh.tagging.search("accounts") == List("default.users"))
    assert(lh.tagging.search("users") == List("default.users"))

    lh.catalogMetadata.setColumnDescription("default.users", "email", "login email")
    lh.catalogMetadata.classify("default.users", "email", "pii")
    intercept[IllegalArgumentException](
      lh.catalogMetadata.classify("default.users", "email", "secret"))
    lh.catalogMetadata.addGlossaryTerm(GlossaryTerm("email",
      "electronic mail address", List("mail")))
    val enriched = lh.catalogMetadata.enrichedSchema("default.users")
    val emailRow = enriched.find(_("name") == "email").get
    assert(emailRow("classification") == "pii")
    assert(emailRow("glossary_terms") == "email")
    assert(lh.catalogMetadata.glossarySearch("mail").nonEmpty)
  }

  test("notifications fire on matching handlers, history capped") {
    val lh = seeded()
    lh.notifications.addHandler(NotificationHandler("default.users", "write", "log", ""))
    lh.notifications.addHandler(NotificationHandler("*", "all", "log", ""))
    val fired = lh.notifications.fireEvent("default.users", "write", "row appended")
    assert(fired.size == 2)
    assert(lh.notifications.fireEvent("other.table", "write", "x").size == 1)
    assert(lh.notifications.history().size == 3)
    intercept[IllegalArgumentException](
      lh.notifications.addHandler(NotificationHandler("t", "bad_event", "log", "")))
  }

  test("cloning: as-of clone, promote, discard") {
    val lh = seeded()
    lh.dml.delete("users", "id > 10") // snapshot 2: 10 rows
    val rec = lh.cloning.clone("default.users", "default.users_v1", asOf = Some("1"))
    assert(rec.asOf.contains("1"))
    assert(lh.catalog.loadTable("users_v1").read().count() == 30)
    lh.cloning.promote("default.users_v1")
    assert(lh.catalog.loadTable("users").read().count() == 30)
    lh.cloning.discard("default.users_v1")
    assert(!lh.catalog.tableExists("default.users_v1"))
    assert(lh.cloning.list().isEmpty)
  }

  test("advisor: slow/repeated queries, partition + materialization suggestions, cost") {
    val lh = seeded()
    // record history: one repeated agg query (slow), one fast query
    lh.savedQueries.recordHistory("SELECT plan, count(*) FROM users WHERE plan = 'pro' GROUP BY plan", 2, 5.0)
    lh.savedQueries.recordHistory("SELECT plan, count(*) FROM users WHERE plan = 'pro' GROUP BY plan", 2, 6.0)
    lh.savedQueries.recordHistory("SELECT 1", 1, 0.01)
    assert(lh.advisor.slowQueries().nonEmpty)
    assert(lh.advisor.repeatedQueries().head._2 == 2)
    val parts = lh.advisor.suggestPartitions("default.users")
    assert(parts.exists(_.column == "plan")) // filtered col with 2 distinct values
    val mats = lh.advisor.suggestMaterializations()
    assert(mats.nonEmpty && mats.head.occurrences == 2)
    val cost = lh.advisor.estimateCost("SELECT * FROM users WHERE id < 5")
    assert(cost.estimatedRows == (30 * 0.3).toLong && cost.complexity == "simple")
    assert(lh.advisor.estimateCost("SELECT * FROM users u JOIN users v ON u.id=v.id GROUP BY u.id")
      .complexity == "moderate")
  }

  test("import/export round trip with format detection") {
    val lh = seeded()
    val dir = SparkFixture.tmpDir("graft-io-")
    val rows = lh.importExport.exportTable("default.users", s"$dir/out_csv",
      format = "csv", where = Some("id <= 5"), columns = Seq("id", "email"))
    assert(rows == 5)
    // import it back under a new table (csv dir has part files — read dir as csv)
    val n = lh.importExport.importFile(s"$dir/out_csv", "default.users_copy",
      format = Some("csv"))
    assert(n == 5)
    assert(lh.catalog.loadTable("users_copy").read().columns.toSeq == Seq("id", "email"))
    // append mode aligns/casts columns
    val n2 = lh.importExport.importFile(s"$dir/out_csv", "default.users_copy",
      ifExists = "append", format = Some("csv"))
    assert(n2 == 5 && lh.catalog.loadTable("users_copy").read().count() == 10)
    intercept[IllegalArgumentException](
      lh.importExport.importFile(s"$dir/out_csv", "default.users_copy",
        ifExists = "fail", format = Some("csv")))
  }

  test("backup/restore with checksum verification") {
    val lh = seeded()
    val dir = SparkFixture.tmpDir("graft-bk-")
    val manifest = lh.backup.backupTable("default.users", s"$dir/users.tar.gz")
    assert(manifest.rowCount == 30)
    assert(lh.backup.verifyBackup(s"$dir/users.tar.gz"))
    val restored = lh.backup.restoreTable(s"$dir/users.tar.gz", "default.users_restored")
    assert(restored == 30)
    val a = lh.catalog.loadTable("users").read().orderBy("id").collect().map(_.toSeq).toSeq
    val b = lh.catalog.loadTable("users_restored").read().orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("listBackups: newest first, manifest found without ./ member prefix") {
    val lh = seeded()
    val dir = SparkFixture.tmpDir("graft-ls-")
    lh.backup.backupTable("default.users", s"$dir/a_old.tar.gz")
    lh.backup.backupTable("default.users", s"$dir/b_new.tar.gz")
    // archive whose members carry no "./" prefix (foreign tar layout,
    // reference backup.py:440-442 matches by suffix)
    val staging = java.nio.file.Files.createTempDirectory("graft-noprefix-")
    java.nio.file.Files.writeString(staging.resolve("metadata.json"),
      graft.core.Jsons.write(graft.io.BackupManifest(
        "default.users", 1L, "{}", "00", 0L)))
    val pb = new ProcessBuilder("tar", "-czf", s"$dir/c_plain.tar.gz",
      "-C", staging.toString, "metadata.json").redirectErrorStream(true).start()
    assert(pb.waitFor() == 0)
    val listed = lh.backup.listBackups(Some(dir.toString))
    assert(listed.map(_._1) == List("c_plain.tar.gz", "b_new.tar.gz", "a_old.tar.gz"))
    assert(listed.forall(_._2.isDefined), "every archive should list a manifest")
    assert(listed.forall(_._3 > 0))
  }
}
