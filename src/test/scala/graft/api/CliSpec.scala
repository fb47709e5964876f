package graft.api

import java.io.{ByteArrayOutputStream, PrintStream}

import org.scalatest.funsuite.AnyFunSuite
import graft.{Lakehouse, SparkFixture}

class CliSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def runCli(lh: Lakehouse, args: String*): String = {
    // the REAL parser (private[api]) — a duplicated copy here would drift
    // out of sync with Cli.BoolFlags
    val (flags, pos) = Cli.parseFlags(args.toList)
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out)) { Cli.run(lh, pos, flags) }
    out.toString
  }

  test("end-to-end CLI session: DDL → DML → query → snapshots → governance") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-").toString)
    runCli(lh, "create-table", "default.emp", "id:long,name:string,salary:double")
    assert(runCli(lh, "tables").contains("default.emp"))
    runCli(lh, "insert", "default.emp",
      """[{"id":1,"name":"Alice","salary":100.0},{"id":2,"name":"Bob","salary":90.0}]""")
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM emp").contains("2"))
    runCli(lh, "update", "default.emp", "id = 2", """{"salary": 95.5}""")
    runCli(lh, "delete", "default.emp", "id = 1")
    val snaps = runCli(lh, "snapshots", "default.emp")
    assert(snaps.linesIterator.size == 3)
    assert(runCli(lh, "query-asof", "default.emp",
      "SELECT count(*) AS n FROM emp", "1").contains("2"))
    runCli(lh, "rollback", "default.emp", "1")
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM emp").contains("2"))
    // governance verbs
    runCli(lh, "tag", "default.emp", "HR")
    assert(runCli(lh, "search", "hr").contains("default.emp"))
    runCli(lh, "mask-set", "name", "hash")
    val masked = runCli(lh, "mask-query", "SELECT name FROM emp LIMIT 1")
    assert(masked.contains("Alice") == false && masked.matches("(?s).*[0-9a-f]{16,}.*"))
    val prof = runCli(lh, "profile", "default.emp")
    assert(prof.contains("rows=2"))
    // describe shows field ids
    assert(runCli(lh, "describe", "default.emp").contains("id=1"))
    // sample fixtures through the CLI
    runCli(lh, "create-samples")
    assert(runCli(lh, "tables").contains("default.expenses"))
    assert(runCli(lh, "suggest-joins").contains("ON a.id = b.id"))
  }

  test("schema evolution, maintenance and partition verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli3-").toString)
    runCli(lh, "create-table", "default.t", "id:long,v:double")
    runCli(lh, "insert", "default.t", """[{"id":1,"v":1.5},{"id":2,"v":2.5}]""")
    runCli(lh, "alter-add-column", "default.t", "note", "string")
    assert(runCli(lh, "describe", "default.t").contains("note"))
    runCli(lh, "alter-rename-column", "default.t", "note", "comment")
    assert(runCli(lh, "describe", "default.t").contains("comment"))
    runCli(lh, "alter-drop-column", "default.t", "comment")
    assert(!runCli(lh, "describe", "default.t").contains("comment"))
    runCli(lh, "set-property", "default.t", "owner", "me")
    assert(runCli(lh, "alter-get-property", "default.t", "owner").trim == "me")
    runCli(lh, "alter-remove-property", "default.t", "owner")
    assert(runCli(lh, "alter-get-property", "default.t", "owner").trim == "")

    runCli(lh, "insert", "default.t", """[{"id":3,"v":3.5}]""")
    assert(runCli(lh, "maintenance-status", "default.t").contains("snapshots=2"))
    assert(runCli(lh, "compact", "default.t").contains("compacted to 1 files"))
    assert(runCli(lh, "maintenance-status", "default.t").contains("data_files=1"))
    assert(runCli(lh, "cleanup", "default.t", "--dry-run").contains("orphan files"))
    runCli(lh, "maintain-set", "default.t", "--compact-threshold", "3")
    assert(runCli(lh, "maintain-show", "default.t").contains("compact_threshold=3"))
    assert(runCli(lh, "maintain-table", "default.t", "--dry-run") != null)
    runCli(lh, "retention-set", "default.t", "--max-snapshots", "2")
    assert(runCli(lh, "retention-show", "default.t").contains("max_snapshots=2"))
    assert(runCli(lh, "retention-check", "default.t").contains("would expire"))
    assert(runCli(lh, "retention-run", "default.t").contains("expired"))

    val pt = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli3p-").toString)
    runCli(pt, "create-table", "default.p", "id:long,cat:string", "--partition", "cat")
    runCli(pt, "insert", "default.p",
      """[{"id":1,"cat":"a"},{"id":2,"cat":"b"},{"id":3,"cat":"a"}]""")
    assert(runCli(pt, "partitions", "default.p").contains("cat=a"))
    assert(runCli(pt, "partition-stats", "default.p").contains("rows=2"))
    assert(runCli(pt, "diff", "default.p").contains("added:"))
  }

  test("saved queries, cache, batch and dashboard verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli4-").toString)
    runCli(lh, "create-table", "default.q", "id:long,v:double")
    runCli(lh, "batch",
      """[{"op":"insert","table":"default.q","rows":[{"id":1,"v":1.0},{"id":2,"v":2.0}]},
         {"op":"update","table":"default.q","filter":"id = 2","set":{"v":9.0}}]""")
    assert(runCli(lh, "query", "SELECT sum(v) AS s FROM q").contains("10"))
    runCli(lh, "query-save", "total", "SELECT sum(v) AS s FROM q")
    assert(runCli(lh, "query-list").contains("total"))
    assert(runCli(lh, "query-run", "total").contains("10"))
    assert(runCli(lh, "query-history").contains("SELECT sum(v) AS s FROM q"))
    runCli(lh, "query-delete", "total")
    assert(!runCli(lh, "query-list").contains("total"))
    assert(runCli(lh, "cache-query", "SELECT count(*) AS n FROM q").contains("miss"))
    assert(runCli(lh, "cache-query", "SELECT count(*) AS n FROM q").contains("hit"))
    assert(runCli(lh, "cache-stats").contains("hits=1"))
    runCli(lh, "cache-clear")
    val dash = runCli(lh, "dashboard")
    assert(dash.contains("default.q") && dash.contains("tables: 1"))
  }

  test("cdc, watermark, view/matview/pipeline and lineage verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli5-").toString)
    runCli(lh, "create-table", "default.c", "id:long,v:double")
    runCli(lh, "insert", "default.c", """[{"id":1,"v":1.0}]""")
    runCli(lh, "insert", "default.c", """[{"id":2,"v":2.0}]""")
    assert(runCli(lh, "change-summary", "default.c", "--keys", "id")
      .contains("inserted=1"))
    val tmp = SparkFixture.tmpDir("graft-cli5x-").toString + "/changes"
    runCli(lh, "change-export", "default.c", tmp, "--keys", "id")
    assert(new java.io.File(tmp).exists)
    runCli(lh, "watermark-set", "p1", "default.c", "1")
    assert(runCli(lh, "watermark-show", "p1", "default.c").contains("snapshot=1"))
    runCli(lh, "watermark-reset", "p1")
    assert(runCli(lh, "watermark-show", "p1", "default.c").contains("no watermark"))

    runCli(lh, "view-create", "v1", "SELECT id FROM c WHERE id > 1")
    assert(runCli(lh, "view-show", "v1").contains("SELECT id"))
    runCli(lh, "view-drop", "v1")
    assert(!runCli(lh, "views").contains("v1"))
    runCli(lh, "matview-create", "mv1", "SELECT count(*) AS n FROM c")
    assert(runCli(lh, "matview-list").contains("mv1"))
    assert(runCli(lh, "matview-query", "mv1").contains("2"))
    runCli(lh, "matview-drop", "mv1")
    assert(!runCli(lh, "matview-list").contains("mv1"))

    runCli(lh, "pipeline-create", "pl1",
      """[{"sql":"SELECT id, v FROM c","target_table":"default.out1"}]""")
    assert(runCli(lh, "pipeline-show", "pl1").contains("default.out1"))
    runCli(lh, "pipeline-run", "pl1")
    runCli(lh, "lineage-add", "default.out1", "pipeline", "--sources", "default.c")
    assert(runCli(lh, "lineage-graph").contains("default.c -> default.out1"))
    assert(runCli(lh, "lineage-impact", "default.c").contains("default.out1"))
    runCli(lh, "pipeline-drop", "pl1")
    assert(!runCli(lh, "pipelines").contains("pl1"))
  }

  test("governance extras: masking, contracts, sla, metadata, notify, clones") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli6-").toString)
    runCli(lh, "create-table", "default.g", "id:long,email:string")
    runCli(lh, "insert", "default.g",
      """[{"id":1,"email":"a@x.com"},{"id":2,"email":"b@x.com"}]""")

    runCli(lh, "mask-set", "email", "hash")
    assert(runCli(lh, "mask-list").contains("email: hash"))
    assert(runCli(lh, "mask-preview", "default.g").contains("->"))
    runCli(lh, "mask-remove", "email")
    assert(!runCli(lh, "mask-list").contains("email"))

    runCli(lh, "contract-generate", "default.g")
    assert(runCli(lh, "contract-list").contains("default.g"))
    assert(runCli(lh, "contract-show", "default.g").contains("not_null"))
    assert(runCli(lh, "contract-validate", "default.g").contains("PASS"))
    runCli(lh, "contract-monitor", "default.g")
    assert(runCli(lh, "contract-compliance", "default.g").nonEmpty)
    assert(runCli(lh, "contract-trends", "default.g").nonEmpty)
    runCli(lh, "contract-add-consumer", "default.g", "teamA")
    runCli(lh, "contract-add-producer", "default.g", "etl")
    assert(runCli(lh, "contract-registry").contains("teamA"))
    assert(runCli(lh, "contract-coverage").contains("covered=1"))
    assert(runCli(lh, "contract-dashboard").contains("contracts: 1"))
    // history records prior versions on update; after the initial create it
    // is empty — the verb just has to run cleanly
    assert(runCli(lh, "contract-history", "default.g") != null)
    runCli(lh, "contract-drop", "default.g")
    assert(!runCli(lh, "contract-list").contains("default.g"))

    runCli(lh, "sla-set", "default.g", "--min-rows", "1")
    assert(runCli(lh, "sla-list").contains("default.g"))
    assert(runCli(lh, "sla-show", "default.g").contains("default.g"))
    runCli(lh, "sla-check", "default.g")
    assert(runCli(lh, "sla-history", "default.g").contains("issues=0"))
    runCli(lh, "sla-remove", "default.g")
    assert(!runCli(lh, "sla-list").contains("default.g"))

    runCli(lh, "glossary-add", "PII", "personally identifiable", "--aliases", "personal")
    assert(runCli(lh, "glossary-list").contains("PII"))
    assert(runCli(lh, "glossary-search", "personal").contains("PII"))
    runCli(lh, "classify", "default.g", "email", "pii")
    assert(runCli(lh, "classifications", "default.g").contains("pii"))
    runCli(lh, "column-describe", "default.g", "email", "user email address")
    assert(runCli(lh, "column-descriptions", "default.g").contains("user email"))
    runCli(lh, "tag", "default.g", "core")
    assert(runCli(lh, "tag-show", "default.g").contains("core"))
    runCli(lh, "tag-remove", "default.g", "core")
    assert(!runCli(lh, "tag-show", "default.g").contains("core"))
    runCli(lh, "describe-set", "default.g", "the g table")
    runCli(lh, "bookmark", "default.g")
    assert(runCli(lh, "bookmarks").contains("default.g"))
    runCli(lh, "unbookmark", "default.g")
    assert(!runCli(lh, "bookmarks").contains("default.g"))

    runCli(lh, "notify-add", "default.g", "write", "log", "stdout")
    assert(runCli(lh, "notify-list", "default.g").contains("write"))
    assert(runCli(lh, "notify-test", "default.g", "write", "hello").contains("fired"))
    assert(runCli(lh, "notify-history").contains("hello"))

    runCli(lh, "clone", "default.g", "default.g2")
    assert(runCli(lh, "clone-list").contains("default.g2"))
    runCli(lh, "clone-discard", "default.g2")
    assert(!runCli(lh, "clone-list").contains("default.g2"))

    assert(runCli(lh, "validate-check", "default.g").contains("OK"))
    assert(runCli(lh, "audit").nonEmpty)
    assert(runCli(lh, "audit-clear", "0m").contains("removed"))
  }

  test("sampling, quality, dedup, advisor and format verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli7-").toString)
    runCli(lh, "create-table", "default.s", "id:long,cat:string")
    runCli(lh, "insert", "default.s",
      """[{"id":1,"cat":"a"},{"id":2,"cat":"a"},{"id":3,"cat":"b"},{"id":4,"cat":"b"}]""")
    assert(runCli(lh, "sample-stratified", "default.s", "cat", "0.5").contains("cat"))
    assert(runCli(lh, "sample-systematic", "default.s", "2").contains("id"))
    assert(runCli(lh, "sample-to-table", "default.s", "default.s2", "0.5")
      .contains("sampled"))
    assert(runCli(lh, "dedup-summary", "default.s", "--keys", "cat")
      .contains("duplicate_rows=2"))
    assert(runCli(lh, "dedup-report", "default.s", "--keys", "cat").contains("total"))
    assert(runCli(lh, "quality-report").contains("average_score"))
    runCli(lh, "quality", "default.s")
    assert(runCli(lh, "quality-history", "default.s").nonEmpty)
    assert(runCli(lh, "advisor-patterns").contains("repeated"))
    assert(runCli(lh, "advisor-materializations") != null)
    assert(runCli(lh, "advisor-report").contains("suggestions"))
    runCli(lh, "format-set", "parquet")
    runCli(lh, "format-set-table", "default.s", "vortex")
    assert(runCli(lh, "format-show", "default.s").nonEmpty)
  }

  test("schema inspection, backups, cache policy, auto-refresh and contract extras") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli8-").toString)
    runCli(lh, "create-table", "default.t8", "id:long,v:double")
    runCli(lh, "insert", "default.t8", """[{"id":1,"v":5.0},{"id":2,"v":6.0}]""")
    runCli(lh, "alter-add-column", "default.t8", "w", "string")
    runCli(lh, "insert", "default.t8", """[{"id":3,"v":7.0,"w":"x"}]""")
    assert(runCli(lh, "schema-history", "default.t8").contains("added w"))
    assert(runCli(lh, "schema-diff", "default.t8").contains("added w"))
    // single-sided refs resolve instead of silently falling back:
    // --from the first snapshot diffs against CURRENT (so the add shows)
    assert(runCli(lh, "schema-diff", "default.t8", "--from", "1")
      .contains("added w"))
    // --to the first snapshot: nothing precedes it -> no changes
    assert(runCli(lh, "schema-diff", "default.t8", "--to", "1")
      .contains("no changes"))
    assert(runCli(lh, "schema-migration", "default.t8").contains("add_column w"))
    assert(runCli(lh, "schema-compat", "default.t8", "rename_column", "v",
      "--new-name", "val").contains("compatible"))
    // backups: default dir round-trip
    val bdir = SparkFixture.tmpDir("graft-cli8-bk-")
    runCli(lh, "backup", "default.t8", s"$bdir/t8.tar.gz")
    assert(runCli(lh, "backups", "--dir", bdir.toString).contains("default.t8"))
    // cache policy + entries + history clear
    assert(runCli(lh, "cache-policy", "default.t8", "--ttl-seconds", "60")
      .contains("enabled=true"))
    runCli(lh, "cache-query", "SELECT count(*) AS n FROM t8")
    assert(runCli(lh, "cache-entries").contains("SELECT"))
    assert(runCli(lh, "query-history-clear").contains("cleared"))
    // stats-all after computing stats
    runCli(lh, "stats", "default.t8")
    assert(runCli(lh, "stats-all").contains("default.t8"))
    // auto-refresh config + plan
    runCli(lh, "auto-refresh-set", "default.t8", "--depth", "2")
    assert(runCli(lh, "auto-refresh-plan", "default.t8").contains("cache_invalidate"))
    // watermarks listing
    runCli(lh, "watermark-set", "p1", "default.t8", "1")
    assert(runCli(lh, "watermarks").contains("p1/default.t8"))
    // format conversion rewrites data
    assert(runCli(lh, "convert-format", "default.t8", "vortex").contains("3 rows"))
    // contract extras
    runCli(lh, "contract-generate", "default.t8")
    assert(runCli(lh, "contract-summary", "default.t8").contains("version=1"))
    assert(runCli(lh, "contract-preview", "default.t8", "--strict")
      .contains("not saved"))
    runCli(lh, "contract-monitor", "default.t8")
    assert(runCli(lh, "contract-health", "default.t8").contains("has_contract=true"))
    assert(runCli(lh, "contract-violations", "default.t8").contains("no violations"))
    // sample stats compare
    runCli(lh, "sample-to-table", "default.t8", "default.t8s", "1.0")
    assert(runCli(lh, "sample-stats", "default.t8", "default.t8s").contains("v.mean"))
  }

  test("reference-parity verbs: join, convert, query-vortex, backup-ns, removers, contract docs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-par-").toString)
    runCli(lh, "create-table", "default.emp", "id:long,name:string")
    runCli(lh, "insert", "default.emp",
      """[{"id":1,"name":"Alice"},{"id":2,"name":"Bob"}]""")
    runCli(lh, "create-table", "default.dept", "id:long,dept:string")
    runCli(lh, "insert", "default.dept",
      """[{"id":1,"dept":"eng"},{"id":2,"dept":"ops"}]""")

    // join: inline result + --into materialization
    assert(runCli(lh, "join",
      "SELECT e.name, d.dept FROM emp e JOIN dept d ON e.id = d.id")
      .contains("eng"))
    assert(runCli(lh, "join",
      "SELECT e.name, d.dept FROM emp e JOIN dept d ON e.id = d.id",
      "--into", "default.joined").contains("wrote 2 rows"))
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM joined").contains("2"))

    // file-level convert + query-vortex over the converted file
    val tmp = graft.SparkFixture.tmpDir("graft-conv-").toString
    lh.catalog.loadTable("default.emp").read().write.parquet(s"$tmp/src")
    runCli(lh, "convert", s"$tmp/src", s"$tmp/dst", "--to", "vortex")
    assert(runCli(lh, "query-vortex", s"$tmp/dst",
      "SELECT count(*) AS n FROM data").contains("2"))
    // --compact BEFORE the positionals: regression for the flag being
    // registered in BoolFlags (a valued parse would swallow the table name)
    runCli(lh, "convert-table", "--compact", "default.emp", s"$tmp/exported")
    assert(spark.read.parquet(s"$tmp/exported").count() == 2)

    // namespace backup: one archive per table
    val bdir = graft.SparkFixture.tmpDir("graft-bk-").toString
    val bk = runCli(lh, "backup-ns", "default", bdir)
    assert(bk.contains("default.emp") && bk.contains("default.dept"))
    assert(runCli(lh, "backups", "--dir", bdir).linesIterator.size >= 3)

    // policy/metadata removers
    runCli(lh, "retention-set", "default.emp", "--max-snapshots", "5")
    assert(runCli(lh, "retention-remove", "default.emp").contains("removed"))
    assert(runCli(lh, "retention-remove", "default.emp").contains("no retention"))
    runCli(lh, "maintain-set", "default.emp")
    assert(runCli(lh, "maintain-remove", "default.emp").contains("removed"))
    runCli(lh, "glossary-add", "churn", "customer attrition rate")
    assert(runCli(lh, "glossary-remove", "churn").contains("removed"))
    assert(runCli(lh, "glossary-search", "churn").isEmpty)
    runCli(lh, "lineage-add", "default.joined", "join")
    assert(runCli(lh, "lineage-remove", "default.joined")
      .contains("removed 1 edges"))

    // contract documents from JSON files
    import graft.governance.{Contract, ContractColumn, ContractConstraint}
    val cfile = graft.SparkFixture.tmpDir("graft-ct-").resolve("c.json")
    graft.core.Jsons.writeFile(cfile, Contract("default.emp", 0,
      List(ContractColumn("id", "long", false),
        ContractColumn("name", "string", false)),
      List(ContractConstraint("id", "not_null"))))
    assert(runCli(lh, "contract-create", cfile.toString).contains("v1"))
    assert(runCli(lh, "contract-update", cfile.toString).contains("v2"))
    assert(runCli(lh, "contract-apply", cfile.toString).contains("v3"))
    assert(runCli(lh, "contract-dry-run", "default.emp", cfile.toString)
      .contains("PASS"))
    assert(runCli(lh, "contract-dry-run-migration", "default.emp",
      cfile.toString).nonEmpty)
    val rowsOk = cfile.getParent.resolve("rows.json")
    java.nio.file.Files.write(rowsOk, """{"id":3,"name":"Carol"}""".getBytes)
    assert(runCli(lh, "contract-check-data", "default.emp",
      rowsOk.toString).contains("OK"))
    val rowsBad = cfile.getParent.resolve("rows_bad.json")
    java.nio.file.Files.write(rowsBad, """{"id":null,"name":"Dave"}""".getBytes)
    assert(runCli(lh, "contract-check-data", "default.emp",
      rowsBad.toString).contains("FAIL constraint not_null(id)"))
    assert(runCli(lh, "contract-status", "default.emp").contains("active"))
    assert(runCli(lh, "contract-deprecate", "default.emp")
      .contains("deprecated"))
    assert(runCli(lh, "contract-status", "default.emp").contains("deprecated"))
    runCli(lh, "contract-add-consumer", "default.emp", "dashboards")
    assert(runCli(lh, "contract-consumers", "default.emp")
      .contains("dashboards"))

    // benchmark prints a per-format timing table
    val bench = runCli(lh, "benchmark", "--rows", "100")
    assert(bench.contains("parquet") && bench.contains("vortex"))
  }

  test("curate verb runs the funnel into a target table") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli9-").toString)
    runCli(lh, "create-table", "default.docs", "doc_id:long,text:string")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"text":"the quick brown fox jumps over the lazy dog again and again in the yard"},
         {"doc_id":2,"text":"the quick brown fox jumps over the lazy dog again and again in the yard"},
         {"doc_id":3,"text":"der hund und die katze sind nicht da"},
         {"doc_id":4,"text":"the rain in spain falls mainly on the plain and the hills beyond it"}]""")
    val out = runCli(lh, "curate", "default.docs", "default.curated")
    assert(out.contains("final 2 rows")) // doc 2 exact-dup of 1; doc 3 not en
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM curated").contains("2"))
  }

  test("scrub-spans, score-lm and bucketize verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-span-").toString)
    runCli(lh, "create-table", "default.docs", "doc_id:long,text:string")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"text":"shared boiler plate header body one"},
         {"doc_id":2,"text":"shared boiler plate header body two"},
         {"doc_id":3,"text":"totally original content right here now"}]""")
    val out = runCli(lh, "scrub-spans", "default.docs", "default.clean",
      "--span-tokens", "5")
    assert(out.contains("into default.clean"))
    val clean = runCli(lh, "query",
      "SELECT clean_text FROM clean WHERE doc_id = 1")
    assert(clean.contains("one") && !clean.contains("shared"))

    val lmOut = runCli(lh, "score-lm", "default.docs", "default.scored")
    assert(lmOut.contains("scored 3 docs"))
    assert(runCli(lh, "query",
      "SELECT count(*) AS n FROM scored WHERE avg_logprob < 0").contains("3"))

    val bdir = SparkFixture.tmpDir("graft-cli-bk-").toString
    val bOut = runCli(lh, "bucketize", "default.docs", "bk_docs_cli",
      s"$bdir/t", "--keys", "doc_id", "--buckets", "2")
    assert(bOut.contains("bucketed default.docs by doc_id x2"))
    assert(spark.table("bk_docs_cli").count() == 3)
    graft.io.Bucketing.drop(spark, "bk_docs_cli", purge = true)
  }

  test("funnel, cohort, transitions, histogram, zorder and bloom-join verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-ev-").toString)
    runCli(lh, "create-table", "default.ev",
      "event_id:long,user_id:long,ts:timestamp,event_type:string")
    runCli(lh, "insert", "default.ev",
      """[{"event_id":1,"user_id":1,"ts":"2024-01-01T00:00:00","event_type":"signup"},
         {"event_id":2,"user_id":1,"ts":"2024-01-01T00:05:00","event_type":"view"},
         {"event_id":3,"user_id":1,"ts":"2024-01-02T00:09:00","event_type":"purchase"},
         {"event_id":4,"user_id":2,"ts":"2024-01-01T00:00:00","event_type":"signup"}]""")
    val f = runCli(lh, "funnel", "default.ev",
      "--steps", "signup,view,purchase")
    assert(f.contains("step 1 (signup): 2 users"))
    assert(f.contains("step 3 (purchase): 1 users"))
    val c = runCli(lh, "cohort", "default.ev")
    assert(c.contains("2024-01-01 +0d: 2 users"))
    assert(c.contains("2024-01-01 +1d: 1 users"))
    val tr = runCli(lh, "transitions", "default.ev")
    assert(tr.contains("signup -> view: 1"))
    assert(tr.contains("view -> purchase: 1"))

    runCli(lh, "create-table", "default.pts", "x:long,y:long,v:double")
    runCli(lh, "insert", "default.pts",
      """[{"x":1,"y":1,"v":5.0},{"x":200,"y":9,"v":17.0},{"x":3,"y":300,"v":26.0}]""")
    val h = runCli(lh, "histogram", "default.pts", "v", "--bin-width", "10")
    assert(h.contains("[0.00, 10.00): 1 rows") && h.contains("[10.00, 20.00): 1 rows"))
    val z = runCli(lh, "zorder", "default.pts", "default.pts_z",
      "--cols", "x,y", "--partitions", "2")
    assert(z.contains("z-ordered 3 rows"))
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM pts_z").contains("3"))

    runCli(lh, "create-table", "default.dim", "k:long")
    runCli(lh, "insert", "default.dim", """[{"k":1},{"k":3}]""")
    val b = runCli(lh, "bloom-join", "default.pts", "default.dim",
      "--fact-key", "x", "--dim-key", "k")
    assert(b.contains("2 rows"), b)
  }

  test("split-assign and diversity verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-sp-").toString)
    runCli(lh, "create-table", "default.docs", "doc_id:long,source:string,text:string")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"source":"a","text":"one two three one two three"},
         {"doc_id":2,"source":"a","text":"four five six seven eight nine"},
         {"doc_id":3,"source":"b","text":"x y z x y z"}]""")
    val s = runCli(lh, "split-assign", "default.docs", "default.splits",
      "--key", "doc_id")
    assert(s.contains("assigned 3 rows") && s.contains("train/val/test"))
    val names = runCli(lh, "query",
      "SELECT DISTINCT split FROM splits ORDER BY split")
    assert(Seq("train", "val", "test").exists(names.contains))
    val d = runCli(lh, "diversity", "default.docs", "--ngram", "3")
    assert(d.contains("a: grams=") && d.contains("b: grams="), d)
  }

  test("dedup-best and approx-profile verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-db-").toString)
    runCli(lh, "create-table", "default.docs", "doc_id:long,text:string")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"text":"alpha beta gamma delta epsilon zeta"},
         {"doc_id":2,"text":"alpha beta gamma delta epsilon zeta"},
         {"doc_id":3,"text":"completely different text goes right here"}]""")
    val out = runCli(lh, "dedup-best", "default.docs", "default.best")
    assert(out.contains("kept 2 docs"), out)
    val ids = runCli(lh, "query", "SELECT doc_id FROM best ORDER BY doc_id")
    assert(ids.contains("3"))
    val ap = runCli(lh, "approx-profile", "default.docs")
    assert(ap.contains("doc_id: ~3 distinct"), ap)
  }

  test("quantize verb writes int8 codes + scale for an embedding column") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-qz-").toString)
    import spark.implicits._
    val e = Seq((1L, Seq(1.0f, -2.0f)), (2L, Seq(0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    lh.catalog.createTable("default.emb", e.schema, Nil, Map.empty)
    lh.catalog.loadTable("default.emb").append(e)
    val out = runCli(lh, "quantize", "default.emb", "default.embq")
    assert(out.contains("2 rows") && out.contains("q + q_scale"), out)
    val q = lh.catalog.loadTable("default.embq").read()
      .orderBy("vec_id").collect()
    // scale = 127/max|x|: vec 1 -> 63.5, codes [64, -127]
    assert(q(0).getSeq[Int](q(0).fieldIndex("q")).toSeq == Seq(64, -127))
    assert(q(0).getAs[Double]("q_scale") == 63.5)
    assert(q(1).getSeq[Int](q(1).fieldIndex("q")).toSeq == Seq(127, 64))
  }

  test("similar-docs, completeness and classify-changes verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli10-").toString)
    runCli(lh, "create-table", "default.docs", "doc_id:long,text:string")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"text":"alpha beta gamma delta"},
         {"doc_id":2,"text":"alpha beta gamma delta"},
         {"doc_id":3,"text":"omega psi chi phi"}]""")
    val sim = runCli(lh, "similar-docs", "default.docs", "--threshold", "0.9")
    assert(sim.contains("1 ~ 2") && !sim.contains("3"))
    val simIdf = runCli(lh, "similar-docs", "default.docs",
      "--threshold", "0.9", "--tfidf")
    assert(simIdf.contains("1 ~ 2"))

    val comp = runCli(lh, "completeness", "default.docs")
    assert(comp.contains("doc_id: rows=3 nulls=0 distinct=3 completeness=1.0000"))

    runCli(lh, "create-table", "default.docs2", "doc_id:long,text:string")
    runCli(lh, "insert", "default.docs2",
      """[{"doc_id":1,"text":"alpha beta gamma delta"},
         {"doc_id":2,"text":"CHANGED"},
         {"doc_id":4,"text":"brand new"}]""")
    val ch = runCli(lh, "classify-changes", "default.docs", "default.docs2",
      "--keys", "doc_id")
    assert(ch.contains("INSERT: doc_id=4"))
    assert(ch.contains("DELETE: doc_id=3"))
    assert(ch.contains("UPDATE_AFTER: doc_id=2, text=CHANGED [changed: text]"))
  }

  test("decontaminate verb lists and removes train/eval overlap") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli11-").toString)
    runCli(lh, "create-table", "default.train", "doc_id:long,text:string")
    runCli(lh, "create-table", "default.eval", "doc_id:long,text:string")
    runCli(lh, "insert", "default.train",
      """[{"doc_id":1,"text":"alpha beta gamma delta epsilon zeta eta theta"},
         {"doc_id":2,"text":"clean training data with no leak at all today"}]""")
    runCli(lh, "insert", "default.eval",
      """[{"doc_id":10,"text":"alpha beta gamma delta epsilon zeta eta theta"},
         {"doc_id":11,"text":"pristine evaluation prompt nothing shared here"}]""")
    val listed = runCli(lh, "decontaminate", "default.train", "default.eval")
    assert(listed.contains("train 1 ~ eval 10"))
    val removed = runCli(lh, "decontaminate", "default.train", "default.eval",
      "--remove")
    assert(removed.contains("removed 1 contaminated docs"))
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM eval").contains("1"))
  }

  test("pii-report and redact verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli12-").toString)
    runCli(lh, "create-table", "default.msgs", "doc_id:long,text:string")
    runCli(lh, "insert", "default.msgs",
      """[{"doc_id":1,"text":"mail me at a@b.co or 555-123-4567"},
         {"doc_id":2,"text":"nothing private"}]""")
    val rep = runCli(lh, "pii-report", "default.msgs")
    assert(rep.contains("email: 1") && rep.contains("phone: 1") &&
      rep.contains("ssn: 0"))
    runCli(lh, "redact", "default.msgs", "default.msgs_clean")
    val out = runCli(lh, "query",
      "SELECT text FROM msgs_clean WHERE doc_id = 1")
    assert(out.contains("[EMAIL]") && out.contains("[PHONE]") &&
      !out.contains("a@b.co"))
  }

  test("pack-sequences verb reports per-sequence totals") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli13-").toString)
    runCli(lh, "create-table", "default.corpus", "doc_id:long,source:string,text:string")
    runCli(lh, "insert", "default.corpus",
      """[{"doc_id":1,"source":"s1","text":"one two three"},
         {"doc_id":2,"source":"s1","text":"four five"},
         {"doc_id":3,"source":"s1","text":"six seven eight nine"}]""")
    val out = runCli(lh, "pack-sequences", "default.corpus", "--budget", "5")
    // 3 + 2 tokens fill seq 0 (cum-before 0 and 3 < 5); doc 3 starts at 5 -> seq 1
    assert(out.contains("s1 seq 0: docs=2 tokens=5"))
    assert(out.contains("s1 seq 1: docs=1 tokens=4"))
    val mix = runCli(lh, "mixture-plan", "default.corpus", "100")
    // single source: uniform share 1.0, budget exceeds tokens -> capped at 1
    assert(mix.contains("s1: docs=3 tokens=9 share=1.0000 fraction=1.0000"))
    val ch = runCli(lh, "chunk", "default.corpus", "default.chunks",
      "--size", "3", "--stride", "2")
    // docs of 3/2/4 tokens at size 3 stride 2 -> 1 + 1 + 2 chunks
    assert(ch.contains("wrote 4 chunks"))
  }

  test("round-7 analytics verbs: kmv-distinct, skew-report, vocab-coverage, weighted-sample") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-r7-").toString)
    runCli(lh, "create-table", "default.docs",
      "doc_id:long,text:string,n_chars:long")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"text":"alpha beta alpha","n_chars":16},
         {"doc_id":2,"text":"alpha gamma","n_chars":11},
         {"doc_id":3,"text":"beta beta beta","n_chars":14}]""")
    val kmv = runCli(lh, "kmv-distinct", "default.docs", "doc_id")
    assert(kmv.contains("est=3"), kmv) // 3 distinct ids, below k: exact
    val skew = runCli(lh, "skew-report", "default.docs", "doc_id")
    assert(skew.contains("keys=3") && skew.contains("salt=1"), skew)
    val cov = runCli(lh, "vocab-coverage", "default.docs",
      "--percents", "50,100")
    // corpus tokens: alpha x3, beta x4, gamma x1 -> 50% needs 'beta' only
    assert(cov.contains("50%: 1 tokens"), cov)
    assert(cov.contains("100%: 3 tokens"), cov)
    runCli(lh, "weighted-sample", "default.docs", "default.ws",
      "--weight-col", "n_chars", "--k", "2")
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM ws").contains("2"))
  }

  test("round-7 event verbs: event-paths, mad-outliers, attribute") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-r7e-").toString)
    runCli(lh, "create-table", "default.ev",
      "event_id:long,ts:timestamp,user_id:long,event_type:string,value:double")
    runCli(lh, "insert", "default.ev",
      """[{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":1,"event_type":"click","value":1.0},
         {"event_id":2,"ts":"2024-01-01T00:05:00","user_id":1,"event_type":"purchase","value":9.0},
         {"event_id":3,"ts":"2024-01-01T00:00:00","user_id":2,"event_type":"click","value":2.0},
         {"event_id":4,"ts":"2024-01-01T00:01:00","user_id":2,"event_type":"click","value":100.0}]""")
    val paths = runCli(lh, "event-paths", "default.ev")
    assert(paths.contains("1x click>purchase") && paths.contains("1x click>click"),
      paths)
    val mad = runCli(lh, "mad-outliers", "default.ev", "value")
    assert(mad.contains("click: n=3"), mad)
    runCli(lh, "attribute", "default.ev", "default.attr")
    val attr = runCli(lh, "query",
      "SELECT attributed FROM attr WHERE event_id = 2")
    assert(attr.contains("1"), attr)
  }

  test("delete-keys verb equality-deletes by key set, merge-on-read") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-eq-").toString)
    runCli(lh, "create-table", "default.t", "id:long,v:double")
    runCli(lh, "insert", "default.t",
      """[{"id":1,"v":1.0},{"id":2,"v":2.0},{"id":3,"v":3.0}]""")
    runCli(lh, "create-table", "default.victims", "id:long")
    runCli(lh, "insert", "default.victims", """[{"id":1},{"id":3}]""")
    val out = runCli(lh, "delete-keys", "default.t", "default.victims",
      "--cols", "id")
    assert(out.contains("equality-deleted 2 rows"), out)
    assert(runCli(lh, "query", "SELECT count(*) AS n FROM t").contains("1"))
  }

  test("rrf-batch and window-heavy-hitters verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-rb-").toString)
    import spark.implicits._
    runCli(lh, "create-table", "default.docs", "doc_id:long,text:string")
    runCli(lh, "insert", "default.docs",
      """[{"doc_id":1,"text":"hash join beats nested loop join"},
         {"doc_id":2,"text":"sort merge join shuffles both sides"},
         {"doc_id":3,"text":"broadcast hash join avoids the shuffle"}]""")
    val e = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    lh.catalog.createTable("default.emb", e.schema, Nil, Map.empty)
    lh.catalog.loadTable("default.emb").append(e)
    val out = runCli(lh, "rrf-batch", "default.docs", "default.emb",
      "--queries", "1:hash,join:1;2:merge,sort:3", "--pool", "3", "--top", "3")
    // both queries produced fused results
    assert(out.contains("q1 doc") && out.contains("q2 doc"), out)

    runCli(lh, "create-table", "default.ev", "ts:timestamp,k:string")
    runCli(lh, "insert", "default.ev",
      """[{"ts":"2024-01-01T00:01:00","k":"a"},
         {"ts":"2024-01-01T00:02:00","k":"a"},
         {"ts":"2024-01-01T00:03:00","k":"a"},
         {"ts":"2024-01-01T00:04:00","k":"b"},
         {"ts":"2024-01-01T01:01:00","k":"c"}]""")
    val hh = runCli(lh, "window-heavy-hitters", "default.ev", "ts", "k",
      "--denom", "2")
    // hour 0: n=4, threshold 2 -> only 'a' (3 >= 2); hour 1: 'c' (1 >= 1)
    assert(hh.contains("key=a") && hh.contains("key=c") && !hh.contains("key=b"),
      hh)
  }

  test("novelty and ann-recall verbs") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli-nv-").toString)
    runCli(lh, "create-table", "default.ref", "doc_id:long,text:string")
    runCli(lh, "create-table", "default.cand", "doc_id:long,text:string")
    runCli(lh, "insert", "default.ref",
      """[{"doc_id":1,"text":"alpha beta gamma delta"}]""")
    runCli(lh, "insert", "default.cand",
      """[{"doc_id":10,"text":"alpha beta gamma delta"},
         {"doc_id":11,"text":"totally new content here"}]""")
    val nv = runCli(lh, "novelty", "default.cand", "default.ref")
    assert(nv.contains("doc 11: novelty=100.0%"), nv)
    assert(nv.contains("doc 10: novelty=0.0%"), nv)

    import spark.implicits._
    val e = (0L until 30L).map(i =>
      (i, Seq(math.cos(i * 0.2).toFloat, math.sin(i * 0.2).toFloat)))
      .toDF("vec_id", "embedding")
    lh.catalog.createTable("default.emb", e.schema, Nil, Map.empty)
    lh.catalog.loadTable("default.emb").append(e)
    val rc = runCli(lh, "ann-recall", "default.emb",
      "--k", "3", "--queries", "4", "--clusters", "4", "--dims", "2")
    // one line per query, recall fractions over k=3
    assert((0L to 4L).forall(q => rc.contains(s"query $q: ")), rc)
    assert(rc.contains("/3"), rc)
  }

  test("parseFlags: boolean flags never swallow a following positional") {
    val (f1, p1) = Cli.parseFlags(List("decontaminate", "--remove", "train", "eval"))
    assert(f1 == Map("remove" -> "true") && p1 == List("decontaminate", "train", "eval"))
    val (f2, p2) = Cli.parseFlags(List("similar-docs", "--tfidf", "docs"))
    assert(f2 == Map("tfidf" -> "true") && p2 == List("similar-docs", "docs"))
    // valued flags still take their value
    val (f3, p3) = Cli.parseFlags(List("export", "t", "p", "--format", "json"))
    assert(f3 == Map("format" -> "json") && p3 == List("export", "t", "p"))
    // the clone-workflow booleans are registered too (a missing BoolFlags
    // entry makes a preceding flag swallow the table name)
    val (f4, p4) = Cli.parseFlags(List("clone-promote", "--require-unchanged", "c"))
    assert(f4 == Map("require-unchanged" -> "true") &&
      p4 == List("clone-promote", "c"))
    val (f5, p5) = Cli.parseFlags(List("clone", "--zero-copy", "a", "b"))
    assert(f5 == Map("zero-copy" -> "true") && p5 == List("clone", "a", "b"))
  }

  test("unknown command raises with usage help") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-cli2-").toString)
    val e = intercept[IllegalArgumentException] {
      runCli(lh, "definitely-not-a-command")
    }
    assert(e.getMessage.contains("unknown command"))
  }
}
