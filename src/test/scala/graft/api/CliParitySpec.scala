package graft.api

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** CLI verb-name parity against the reference CLI (reference cli.py, click
  * command tree) — the CLI counterpart of McpServerSpec's 155-tool name
  * parity. The reference command list is committed as a fixture
  * (`reference_cli_commands.txt`, `group.command` notation); when the
  * reference source is present the fixture is re-derived and checked, so
  * it can never silently go stale.
  *
  * Names differ where the repo uses one flat verb surface (e.g. reference
  * `optimize.cost` → repo `advisor-cost`, `validate.add` → `rule-add`);
  * the explicit rename map below documents every such mapping. A handful
  * of reference commands are flag-variants of one repo verb
  * (`auto-refresh.enable`/`.disable` → `auto-refresh-set --disable`).
  */
class CliParitySpec extends AnyFunSuite {

  private def fixtureCommands: List[String] = {
    val in = getClass.getResourceAsStream("/reference_cli_commands.txt")
    assert(in != null, "reference_cli_commands.txt fixture missing")
    scala.io.Source.fromInputStream(in).getLines().filter(_.nonEmpty).toList
  }

  /** Repo verb set, extracted from the Cli dispatch source. The path is
    * resolved by walking up from the working directory to the first ancestor
    * containing the source tree, so the suite survives forked test JVMs whose
    * CWD is not the repo root.
    */
  private def repoVerbs: Set[String] = {
    val rel = java.nio.file.Paths.get("src/main/scala/graft/api/Cli.scala")
    val cliPath = Iterator
      .iterate(java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath)(
        _.getParent)
      .takeWhile(_ != null)
      .map(_.resolve(rel))
      .find(java.nio.file.Files.isRegularFile(_))
      .getOrElse(fail(s"Cli.scala not found above ${sys.props("user.dir")}"))
    val src = new String(java.nio.file.Files.readAllBytes(cliPath), "UTF-8")
    """case List\("([a-z0-9-]+)"""".r.findAllMatchIn(src).map(_.group(1)).toSet
  }

  /** Reference commands whose repo verb is a semantic rename rather than a
    * mechanical `group.cmd` → `group-cmd` translation. */
  private val renames = Map(
    "auto-refresh.disable" -> "auto-refresh-set", // --disable flag
    "auto-refresh.enable" -> "auto-refresh-set",
    "auto-refresh.list" -> "auto-refresh-plan",
    "auto-refresh.trigger" -> "auto-refresh",
    "backup.create" -> "backup",
    "backup.create-ns" -> "backup-ns",
    "backup.list" -> "backups",
    "cache.list" -> "cache-entries",
    "catalog.describe-column" -> "column-describe",
    "catalog.enriched-schema" -> "schema-enriched",
    "cdc.log" -> "change-log",
    "cdc.summary" -> "change-summary",
    "cdc.export" -> "change-export",
    "cdc.changes" -> "changes",
    "clone.create" -> "clone",
    "config.get-format" -> "format-show",
    "config.set-format" -> "format-set",
    "config.show" -> "format-show",
    "contract.remove" -> "contract-drop",
    "create-namespace" -> "namespace-create",
    "drop-namespace" -> "namespace-drop",
    "ingest" -> "import",
    "join-suggest" -> "suggest-joins",
    "lineage.upstream" -> "lineage",   // lineage prints both directions
    "lineage.downstream" -> "lineage",
    "maintain.check" -> "maintenance-status",
    "maintain.run" -> "maintain",
    "mask.add" -> "mask-set",
    "matview.check" -> "matview-fresh",
    "optimize.cost" -> "advisor-cost",
    "optimize.materializations" -> "advisor-materializations",
    "optimize.patterns" -> "advisor-patterns",
    "optimize.report" -> "advisor-report",
    "pipeline.list" -> "pipelines",
    "quality.score" -> "quality",
    "retention.list" -> "retention-show",
    "sample.create" -> "sample-to-table",
    "sample.random" -> "sample",
    "schema.check" -> "schema-compat",
    "schema.migrate" -> "schema-migration",
    "tag.add" -> "tag",
    "tag.search" -> "search",
    "validate.add" -> "rule-add",
    "validate.list" -> "rules",
    "validate.remove" -> "rule-drop",
    "view.list" -> "views",
    "watermark.list" -> "watermarks")

  test("every reference CLI command has a repo verb") {
    val verbs = repoVerbs
    assert(verbs.size > 150, s"suspiciously few verbs extracted: ${verbs.size}")
    val missing = fixtureCommands.filterNot { c =>
      val candidates = renames.get(c).toList ++ (c.split('.') match {
        case Array(g, n) => List(s"$g-$n", n, s"$n-$g")
        case Array(n) => List(n)
        case _ => Nil
      })
      candidates.exists(verbs.contains)
    }
    assert(missing.isEmpty,
      s"reference commands with no repo verb: ${missing.mkString(", ")}")
  }

  test("rename map targets are real repo verbs") {
    val verbs = repoVerbs
    val dangling = renames.values.toSet.diff(verbs)
    assert(dangling.isEmpty, s"rename map points at missing verbs: $dangling")
  }

  test("fixture matches the reference source when available") {
    val refCli = java.nio.file.Paths.get("/root/reference/src/lakehouse/cli.py")
    assume(java.nio.file.Files.exists(refCli))
    val src = new String(java.nio.file.Files.readAllBytes(refCli), "UTF-8")

    // click tree extraction: `@<parent>.group/command(<optional "name">)`
    // decorators followed by their `def <fn>`; command name = explicit
    // string arg if given else fn name with underscores → hyphens
    val dec = """@(\w+)\.(command|group)\(\s*(?:["']([\w-]+)["'])?""".r
    val defAfter = """(?s)def\s+(\w+)""".r
    val entries = dec.findAllMatchIn(src).map { m =>
      val fn = defAfter.findFirstMatchIn(src.substring(m.end)).get.group(1)
      val name = Option(m.group(3)).getOrElse(fn.replace('_', '-'))
      (m.group(1), m.group(2), fn, name)
    }.toList
    val groupName = entries.collect {
      case (_, "group", fn, name) => fn -> name
    }.toMap
    val derived = entries.collect { case (parent, "command", _, name) =>
      if (parent == "main") name
      else s"${groupName.getOrElse(parent, parent)}.$name"
    }.toSet
    assert(derived == fixtureCommands.toSet,
      s"fixture out of date: +${(derived -- fixtureCommands.toSet).toList.sorted}" +
        s" -${(fixtureCommands.toSet -- derived).toList.sorted}")
  }
}
