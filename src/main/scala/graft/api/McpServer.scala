package graft.api

import java.io.{BufferedReader, InputStreamReader, PrintWriter}

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.Lakehouse

/** MCP (Model Context Protocol) server over stdio — the analogue of the
  * reference's `server.py` (155 tools over the same engine modules).
  *
  * Transport: JSON-RPC 2.0, one message per line on stdin/stdout (the MCP
  * stdio transport). Handles `initialize`, `ping`, `tools/list` and
  * `tools/call`; notifications are accepted and ignored. Tool calls return
  * MCP `content: [{type: "text", ...}]` payloads; handler errors are
  * reported with `isError: true` rather than JSON-RPC faults, mirroring
  * the reference's per-tool try/except (server.py:2353-2360).
  *
  * Implemented with json4s (ships with Spark) — no extra dependencies.
  */
object McpServer {
  private implicit val formats: Formats = DefaultFormats

  val ProtocolVersion = "2024-11-05"

  def main(args: Array[String]): Unit = {
    val warehouse = sys.env.getOrElse("GRAFT_WAREHOUSE",
      sys.props("user.home") + "/.graft/warehouse")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-mcp")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lh = Lakehouse.open(spark, warehouse)
    val in = new BufferedReader(new InputStreamReader(System.in))
    val out = new PrintWriter(System.out, true)
    try serve(lh, () => Option(in.readLine()), out.println(_))
    finally spark.stop()
  }

  /** Protocol loop, separated from process wiring for testability. */
  def serve(lh: Lakehouse, readLine: () => Option[String],
      write: String => Unit): Unit = {
    var running = true
    while (running) readLine() match {
      case None => running = false
      case Some(line) if line.trim.isEmpty => ()
      case Some(line) =>
        handleMessage(lh, line).foreach(write)
    }
  }

  /** Handle one JSON-RPC message; None for notifications (no response). */
  def handleMessage(lh: Lakehouse, line: String): Option[String] = {
    val msg =
      try JsonMethods.parse(line)
      catch {
        case _: Exception =>
          return Some(errorResponse(JNull, -32700, "Parse error"))
      }
    val id = msg \ "id"
    // strict: a JSON number/bool in "method" is NOT a method name
    // (extractOpt[String] would coerce 42 → "42")
    val methodOpt = (msg \ "method") match {
      case JString(m) => Some(m)
      case _ => None
    }
    val params = (msg \ "params") match {
      case o: JObject => o
      case _ => JObject()
    }
    if (id == JNothing || id == JNull) {
      // a structurally invalid message is NOT a notification: JSON-RPC 2.0
      // answers {"jsonrpc":"2.0","method":1} with -32600 and id null
      if (methodOpt.isEmpty) Some(errorResponse(JNull, -32600, "Invalid Request"))
      // notification (e.g. notifications/initialized): no response
      else None
    } else if (methodOpt.isEmpty) {
      // id present but method absent/non-string: structurally invalid
      // request → -32600 per JSON-RPC 2.0 (not -32601 Method not found)
      Some(errorResponse(id, -32600, "Invalid Request"))
    } else methodOpt.get match {
      case "initialize" => Some(response(id, JObject(
        "protocolVersion" -> JString(ProtocolVersion),
        "capabilities" -> JObject("tools" -> JObject()),
        "serverInfo" -> JObject(
          "name" -> JString("graft-lakehouse"),
          "version" -> JString("0.1.0")))))
      case "ping" => Some(response(id, JObject()))
      case "tools/list" => Some(response(id, JObject(
        "tools" -> JArray(McpTools.all.map(t => JObject(
          "name" -> JString(t.name),
          "description" -> JString(t.description),
          "inputSchema" -> t.inputSchema))))))
      case "tools/call" =>
        val name = (params \ "name").extractOpt[String].getOrElse("")
        val arguments = (params \ "arguments") match {
          case o: JObject => o
          case _ => JObject()
        }
        McpTools.byName.get(name) match {
          case None => Some(response(id, toolResult(
            s"Unknown tool: $name", isError = true)))
          case Some(tool) =>
            val result =
              try toolResult(tool.handler(lh, arguments))
              catch {
                case e: Exception => toolResult(
                  s"${tool.name} failed: ${e.getMessage}", isError = true)
              }
            Some(response(id, result))
        }
      case other =>
        Some(errorResponse(id, -32601, s"Method not found: $other"))
    }
  }

  private def toolResult(text: String, isError: Boolean = false): JObject = {
    val base = JObject(
      "content" -> JArray(List(JObject(
        "type" -> JString("text"), "text" -> JString(text)))))
    if (isError) JObject(base.obj :+ ("isError" -> JBool(true))) else base
  }

  private def response(id: JValue, result: JValue): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "jsonrpc" -> JString("2.0"), "id" -> id, "result" -> result)))

  private def errorResponse(id: JValue, code: Int, message: String): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "jsonrpc" -> JString("2.0"), "id" -> id,
      "error" -> JObject(
        "code" -> JInt(code), "message" -> JString(message)))))
}
