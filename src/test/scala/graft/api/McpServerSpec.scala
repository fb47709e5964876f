package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.{Lakehouse, SparkFixture}

class McpServerSpec extends AnyFunSuite {
  private implicit val formats: Formats = DefaultFormats
  lazy val spark = SparkFixture.spark

  private def rpc(lh: Lakehouse, method: String, params: String = "{}",
      id: Int = 1): JValue = {
    val req = s"""{"jsonrpc":"2.0","id":$id,"method":"$method","params":$params}"""
    JsonMethods.parse(McpServer.handleMessage(lh, req)
      .getOrElse(fail(s"no response for $method")))
  }

  private def callTool(lh: Lakehouse, name: String, args: String = "{}"): String = {
    val r = rpc(lh, "tools/call", s"""{"name":"$name","arguments":$args}""")
    assert((r \ "result" \ "isError") == JNothing,
      s"$name errored: ${JsonMethods.compact(r)}")
    (r \ "result" \ "content")(0) \ "text" match {
      case JString(s) => s
      case other => fail(s"unexpected content: $other")
    }
  }

  test("protocol: initialize, ping, tools/list exposes all 155 reference tools") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-mcp-").toString)
    val init = rpc(lh, "initialize")
    assert((init \ "result" \ "serverInfo" \ "name") == JString("graft-lakehouse"))
    assert((rpc(lh, "ping") \ "result") == JObject())
    val tools = (rpc(lh, "tools/list") \ "result" \ "tools").children
    // 155 reference-mirrored tools + the graft_-prefixed training-data
    // tools; the reference set stays exactly 1:1 and collision-free
    assert(McpTools.referenceTools.size == 155)
    assert(McpTools.referenceTools.forall(t => !t.name.startsWith("graft_")))
    assert(tools.size == McpTools.all.size)
    val names = tools.map(t => (t \ "name").extract[String]).toSet
    for (n <- Seq("graft_curate", "graft_dedup_best", "graft_scrub_spans",
      "graft_decontaminate", "graft_split_assign", "graft_quantize",
      "graft_weighted_sample", "graft_kmv_distinct", "graft_vocab_coverage",
      "graft_last_touch", "graft_delete_keys"))
      assert(names.contains(n), s"missing training tool $n")
    // spot-check one per module family
    for (n <- Seq("query", "insert", "backup_table", "schema_diff",
      "set_cache_policy", "find_duplicates", "dashboard", "create_pipeline",
      "register_notification", "dry_run_contract"))
      assert(names.contains(n), s"missing tool $n")
    // every tool has a schema with a type
    tools.foreach(t =>
      assert((t \ "inputSchema" \ "type") == JString("object")))
    // notifications (no id) produce no response
    assert(McpServer.handleMessage(lh,
      """{"jsonrpc":"2.0","method":"notifications/initialized"}""").isEmpty)
    // unknown method errors; unknown tool is isError, not a fault
    assert((rpc(lh, "no/such") \ "error" \ "code") == JInt(-32601))
    // id present but method missing/non-string: -32600 Invalid Request
    val noMethod = JsonMethods.parse(McpServer.handleMessage(lh,
      """{"jsonrpc":"2.0","id":7}""").getOrElse(fail("expected a response")))
    assert((noMethod \ "error" \ "code") == JInt(-32600))
    val badMethod = JsonMethods.parse(McpServer.handleMessage(lh,
      """{"jsonrpc":"2.0","id":8,"method":42}""").getOrElse(fail("expected a response")))
    assert((badMethod \ "error" \ "code") == JInt(-32600))
    // invalid AND id-less: still -32600 with id null (NOT a notification)
    val noIdBad = JsonMethods.parse(McpServer.handleMessage(lh,
      """{"jsonrpc":"2.0","method":42}""").getOrElse(fail("expected a response")))
    assert((noIdBad \ "error" \ "code") == JInt(-32600))
    assert((noIdBad \ "id") == JNull)
    val unknown = rpc(lh, "tools/call", """{"name":"nope","arguments":{}}""")
    assert((unknown \ "result" \ "isError") == JBool(true))
  }

  test("tools/call session: DDL → DML → query → evolution → governance") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-mcp2-").toString)
    callTool(lh, "create_table",
      """{"table_name":"default.emp","columns":[
        {"name":"id","type":"long"},{"name":"name","type":"string"},
        {"name":"salary","type":"double"}]}""")
    assert(callTool(lh, "list_tables").contains("default.emp"))
    callTool(lh, "insert", """{"table_name":"default.emp","rows":[
      {"id":1,"name":"Alice","salary":100.0},{"id":2,"name":"Bob","salary":90.0}]}""")
    assert(callTool(lh, "query", """{"sql":"SELECT count(*) AS n FROM emp"}""")
      .contains("\"n\":2"))
    callTool(lh, "update",
      """{"table_name":"default.emp","filter":"id = 2","set":{"salary":95.5}}""")
    assert(callTool(lh, "list_snapshots", """{"table_name":"default.emp"}""")
      .linesIterator.size == 2)
    // schema evolution + history/diff/migration/compatibility
    callTool(lh, "alter_table",
      """{"table_name":"default.emp","operation":"add_column","column":"dept","type":"string"}""")
    callTool(lh, "insert", """{"table_name":"default.emp","rows":[
      {"id":3,"name":"Cid","salary":80.0,"dept":"eng"}]}""")
    val hist = callTool(lh, "schema_history", """{"table_name":"default.emp"}""")
    assert(hist.contains("added dept"))
    assert(callTool(lh, "schema_diff", """{"table_name":"default.emp"}""")
      .contains("dept"))
    assert(callTool(lh, "schema_migration", """{"table_name":"default.emp"}""")
      .contains("add_column"))
    val compat = callTool(lh, "schema_compatibility",
      """{"table_name":"default.emp","changes":[{"op":"drop_column","column":"id"}]}""")
    // DDL-created columns are nullable, so the drop warns but is compatible
    assert(compat.contains("may depend on it") && compat.contains("compatible"))
    // governance: masking + contract preview/dry-run + violations
    callTool(lh, "add_masking_policy", """{"column":"name","strategy":"hash"}""")
    val masked = callTool(lh, "query_with_masking",
      """{"sql":"SELECT name FROM emp WHERE id = 1"}""")
    assert(!masked.contains("Alice"))
    val preview = callTool(lh, "preview_contract", """{"table_name":"default.emp"}""")
    assert(preview.contains("constraints"))
    val dry = callTool(lh, "dry_run_contract",
      """{"table_name":"default.emp","contract":{"table":"default.emp","version":0,
        "columns":[{"name":"id","dataType":"long","nullable":false}],
        "constraints":[{"column":"salary","kind":"range","params":{"min":"0","max":"50"}}]}}""")
    assert(dry.contains("FAIL constraint range(salary)")) // salaries are 80-100
    // cache policy + notifications + backups round-trip
    assert(callTool(lh, "set_cache_policy",
      """{"table_name":"default.emp","enabled":false}""").contains("false"))
    val reg = callTool(lh, "register_notification",
      """{"table_name":"default.emp","event":"write","kind":"log","target":"t"}""")
    val hid = reg.split("handler_id=")(1).trim
    assert(callTool(lh, "list_notifications").contains(hid))
    assert(callTool(lh, "remove_notification",
      s"""{"handler_id":"$hid"}""") == "removed")
    val dir = SparkFixture.tmpDir("graft-mcp-bk-")
    callTool(lh, "backup_table",
      s"""{"table_name":"default.emp","target_path":"$dir/emp.tar.gz"}""")
    assert(callTool(lh, "list_backups",
      s"""{"backup_dir":"$dir"}""").contains("default.emp"))
    assert(callTool(lh, "verify_backup",
      s"""{"archive_path":"$dir/emp.tar.gz"}""") == "OK")
    // dashboard + join-to-table
    assert(callTool(lh, "dashboard").contains("default.emp"))
    callTool(lh, "join_to_table",
      """{"sql":"SELECT e1.id, e2.name FROM default.emp e1 JOIN default.emp e2 ON e1.id = e2.id",
         "target_table":"default.selfjoin"}""")
    assert(callTool(lh, "query", """{"sql":"SELECT count(*) AS n FROM selfjoin"}""")
      .contains("\"n\":3"))
  }

  test("training-data tools dispatch end-to-end: split, scrub, dedup-best") {
    val lh = Lakehouse.open(spark, SparkFixture.tmpDir("graft-mcp3-").toString)
    callTool(lh, "create_table",
      """{"table_name":"default.docs","columns":[
        {"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}""")
    // two exact near-dups (1, 2) + one unique (3) + a repeated 3-token span
    callTool(lh, "insert", """{"table_name":"default.docs","rows":[
      {"doc_id":1,"text":"the quick brown fox jumps over the lazy dog again"},
      {"doc_id":2,"text":"the quick brown fox jumps over the lazy dog again"},
      {"doc_id":3,"text":"an entirely different document about spark engines"}]}""")
    val split = callTool(lh, "graft_split_assign",
      """{"table_name":"default.docs","target_table":"default.docs_split",
         "key":"doc_id"}""")
    assert(split.contains("3 rows") && split.contains("train/val/test"), split)
    assert(callTool(lh, "query",
      """{"sql":"SELECT count(DISTINCT split) AS k FROM docs_split"}""")
      .contains("\"k\""))
    val scrub = callTool(lh, "graft_scrub_spans",
      """{"table_name":"default.docs","target_table":"default.docs_scrubbed",
         "span_tokens":3}""")
    assert(scrub.contains("into default.docs_scrubbed"), scrub)
    // docs 1 and 2 are identical: every 3-token span repeats cross-doc,
    // so their scrubbed text is empty; doc 3 is untouched
    assert(callTool(lh, "query",
      """{"sql":"SELECT count(*) AS n FROM docs_scrubbed WHERE n_removed > 0"}""")
      .contains("\"n\":2"))
    val dedup = callTool(lh, "graft_dedup_best",
      """{"table_name":"default.docs","target_table":"default.docs_deduped"}""")
    assert(dedup.contains("kept 2"), dedup)
    assert(callTool(lh, "query",
      """{"sql":"SELECT count(*) AS n FROM docs_deduped"}""").contains("\"n\":2"))
  }
}
