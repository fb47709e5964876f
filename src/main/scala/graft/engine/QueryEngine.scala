package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.ColumnBridge

import graft.Lakehouse
import graft.core.{Catalog, FilePruning}

/** SQL entry point over catalog tables (reference query.py / joins.py).
  *
  * Differences from the reference, by design:
  *  - table registration is LAZY temp views over the current snapshot's
  *    files (the reference eagerly materializes every table to Arrow before
  *    each query, query.py:68 — defeating predicate pushdown), and PER
  *    QUERY: only the tables a statement references are resolved
  *    (query.py:52-75 re-registers the whole catalog per query — O(catalog)
  *    driver metadata I/O at scale);
  *  - the engine's own manifest/partition/bloom FILE SKIPPING is wired into
  *    this path ([[prunedViewsFor]]): a `WHERE ts > X` arriving through
  *    query/CLI/MCP opens only the files whose stats can match, instead of
  *    listing and tasking every file of a 100 TB table and recovering only
  *    parquet row-group pushdown per file.
  */
class QueryEngine(lh: Lakehouse) {
  import lh.spark

  /** (keptFiles, totalFiles) per table ident for the last [[execute]] that
    * attempted file skipping — scan-stats introspection for tests/tooling.
    * Empty when the last query had no prunable single-table predicate. */
  @volatile var lastScanStats: Map[String, (Int, Int)] = Map.empty

  /** Register all tables under short + `ns__table` names (query.py:52-75,
    * joins.py:13-41). Cheap — no materialization. Kept as the explicit
    * whole-catalog refresh; [[execute]] registers per query instead. */
  def refresh(): Unit = lh.catalog.registerViews()

  /** Rewrite `ns.table` → `ns__table` for known tables (joins.py:44-55 does
    * a blind string replace; this version is token-aware: whole identifiers
    * only, and text inside single-quoted SQL literals is left untouched).
    * Cost is O(sql + referenced), NEVER O(catalog): candidate `a.b`
    * identifier pairs are extracted from the TEXT (one overlapping-match
    * scan) and only those that are real tables rewrite — folding a regex
    * per catalog table over every query was measurably linear in
    * warehouse size (tools/CatalogScale: ~40 ms/query at 10k tables,
    * growing ~4 ms per additional 1k tables). */
  def rewriteNamespaces(sql: String): String = {
    // zero-width match with captures = OVERLAPPING candidates, so the
    // `ns.table` inside `cat.ns.table` is still found (the per-ident
    // replaceAll matched it too — `\b` holds between `.` and a letter).
    // Name parts allow leading digits (parseIdent imposes no charset and
    // the pre-candidate rewrite handled `default.2024sales`); numeric
    // literals like `1.5` become candidates that tableExists cheaply
    // rejects
    val candRe = "(?=\\b([A-Za-z0-9_]+\\.[A-Za-z0-9_]+)\\b)".r
    val parts = sql.split("'", -1)
    val idents = parts.zipWithIndex.flatMap { case (seg, i) =>
      if (i % 2 == 1) Nil // inside a quoted literal
      else candRe.findAllMatchIn(seg).map(_.group(1)).toList
    }.distinct.sorted.filter(lh.catalog.tableExists)
    if (idents.isEmpty) return sql
    parts.zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 1) seg // inside a quoted literal
      else idents.foldLeft(seg) { (s, ident) =>
        s.replaceAll("\\b" + java.util.regex.Pattern.quote(ident) + "\\b(?!\\w)",
          ident.replace(".", "__"))
      }
    }.mkString("'")
  }

  /** Naive bare-SELECT auto-LIMIT parity (query.py:162-164): applied only
    * when the SQL has no LIMIT substring, as the reference does. */
  def needsLimit(sql: String): Boolean = !sql.toUpperCase.contains("LIMIT")

  /** `maxRows <= 0` disables the auto-LIMIT entirely — the path for
    * materializing a full result to a table. A `limit(Int.MaxValue)`
    * sentinel would NOT be free: GlobalLimit shuffles every row to a
    * single partition, so "unlimited" must mean no limit node at all. */
  /** Serializes analysis: registerReferenced rebinds session-global temp
    * views to the current snapshot, and executeAsOf temporarily binds a
    * table's views to a PAST snapshot — without the lock a concurrent
    * analysis could bind inside that asof window. File-skipping itself
    * no longer touches any view (see [[prunedPlanFor]]), so a direct
    * spark.sql issued outside the engine can never observe a narrowed
    * scan. The lock covers ANALYSIS only (driver-side, milliseconds) —
    * returned frames are lazy, so query EXECUTION still runs fully
    * parallel. */
  private val analysisLock = new Object

  def execute(sql: String, maxRows: Int = 1000): DataFrame = {
    val rewritten = rewriteNamespaces(sql)
    val df = analysisLock.synchronized {
      val referenced = registerReferenced(rewritten)
      val d = spark.sql(rewritten)
      lastScanStats = Map.empty
      prunedPlanFor(d, referenced).getOrElse(d)
    }
    recordLineage(sql)
    if (maxRows > 0 && needsLimit(sql)) df.limit(maxRows) else df
  }

  /** Register temp views for ONLY the catalog tables `rewritten` references
    * — names that are not catalog tables (CTE aliases, logical views, temp
    * views registered elsewhere) are left to Spark's own resolution, as
    * before. Returns the registered idents. */
  private def registerReferenced(rewritten: String): Seq[String] = {
    val idents = referencedTables(rewritten).map { n =>
      val (ns, t) = Catalog.parseIdent(n)
      s"$ns.$t"
    }.distinct.filter(lh.catalog.tableExists)
    idents.foreach(lh.catalog.registerView)
    idents
  }

  /** Manifest/partition/bloom FILE SKIPPING for the SQL surface.
    *
    * Walks the optimized plan (where PushDownPredicates has already placed
    * filters next to their scans) for Filter nodes whose entire subtree
    * reads data files of exactly ONE referenced table, extracts the
    * prunable `attr op literal` conjuncts of those conditions, and — when
    * the conjuncts actually drop files — SUBTRACTS the pruned-out files
    * from the already-analyzed plan's own scan leaves (same
    * `LogicalRelation`, same output exprIds, fewer files; an
    * all-files-pruned leaf becomes an empty `LocalRelation`). No temp
    * view is ever rebound, so a concurrent `spark.sql` outside the
    * engine can never observe a narrowed scan, and the query is analyzed
    * exactly once. Safety rules, each conservative:
    *  - a table's data relations must ALL sit under such filters — a
    *    self-join occurrence without its own filter disables pruning for
    *    that table;
    *  - multiple filters on one table contribute only the INTERSECTION of
    *    their conjunct sets (a self-join with different predicates prunes
    *    by what they share, possibly nothing);
    *  - relation totals count SUBQUERY occurrences too, while coverage
    *    counts only main-plan ones — a scalar subquery reading the same
    *    table therefore BLOCKS pruning instead of silently aggregating
    *    over a narrowed view;
    *  - only `data/commit-*` scans are owned by a table: a MoR snapshot's
    *    position/equality delete-file reads neither count nor disqualify,
    *    and the pruned view re-applies all deletes itself;
    *  - the prune never drops a file that could match (FilePruning's
    *    three-valued design) and the user's own predicate stays in the
    *    re-analyzed plan, so results are identical to the unpruned read.
    * Returns the swapped frame, or None when nothing pruned. */
  private def prunedPlanFor(d: DataFrame,
      referenced: Seq[String]): Option[DataFrame] = {
    if (referenced.isEmpty) return None
    val plan = d.queryExecution.optimizedPlan
    val dirs: Map[String, String] = referenced.map { ident =>
      val (ns, t) = Catalog.parseIdent(ident)
      ident -> lh.catalog.tableDir(ns, t).toString
    }.toMap

    // The ident whose data files this leaf scans, or None for anything
    // else (delete-file reads, local relations, foreign paths).
    def ownerOf(p: LogicalPlan): Option[String] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(_.toUri.getPath)
          val owners = paths.map(pp => dirs.collectFirst {
            case (id, d) if pp.startsWith(d + "/data/commit-") => id
          })
          if (paths.nonEmpty && owners.forall(_.isDefined) &&
              owners.flatten.distinct.size == 1) owners.head
          else None
        case _ => None
      }
      case _ => None
    }

    val totals = plan
      .collectWithSubqueries { case lr: LogicalRelation => ownerOf(lr) }
      .flatten.groupBy(identity).map { case (k, v) => k -> v.size }

    val covered = scala.collection.mutable.Map.empty[String, Int]
    val conds = scala.collection.mutable.Map.empty[String, List[Expression]]
    def splitAnd(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        splitAnd(l) ++ splitAnd(r)
      case o => Seq(o)
    }
    def walk(p: LogicalPlan): Unit = p match {
      case f: LFilter =>
        val leaves = f.child.collectLeaves()
        val owners = leaves.map(ownerOf)
        if (leaves.nonEmpty && owners.forall(_.isDefined) &&
            owners.flatten.distinct.size == 1) {
          val t = owners.head.get
          // PROVENANCE check, by exprId: a conjunct prunes only if every
          // attribute it references IS an output of the scan itself. A
          // HAVING filter above an Aggregate whose alias collides with a
          // base column name ("… MAX(ts) AS ts … HAVING ts > X") sits in
          // exactly this subtree shape, but its attributes carry the
          // AGGREGATE's exprIds, not the scan's — matching by name alone
          // would prune data files by a row-level column that was never
          // filtered. Skipped conjuncts simply don't prune.
          val scanIds = leaves.flatMap(_.output.map(_.exprId)).toSet
          val rowLevel = splitAnd(f.condition).filter(_.references.toSeq
            .forall(a => scanIds.contains(a.exprId)))
          if (rowLevel.nonEmpty) {
            covered(t) = covered.getOrElse(t, 0) + leaves.size
            conds(t) = rowLevel.reduce(
              org.apache.spark.sql.catalyst.expressions.And) ::
              conds.getOrElse(t, Nil)
          } else f.children.foreach(walk)
          // no recursion under a recorded filter: CombineFilters has
          // already merged nested filters
        } else f.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)

    var stats = Map.empty[String, (Int, Int)]
    // pruned-OUT path set per prunable ident (manifest renderings)
    val prunedOut: Map[String, Set[String]] =
      conds.keys.toSeq.sorted.flatMap { ident =>
        if (!totals.get(ident).contains(covered(ident))) None
        else {
          val tbl = lh.catalog.loadTable(ident)
          val schema = tbl.schema
          val sets = conds(ident).map(c => FilePruning
            .conjunctsFromLeaves(ColumnBridge.catalystConjuncts(c), schema).toSet)
          val conjs = sets.reduce(_ intersect _).toSeq
          if (conjs.isEmpty) None
          else {
            val (out, kept, total) = tbl.prunedOutPaths(conjs)
            stats += ident -> ((kept, total))
            if (out.isEmpty) None else Some(ident -> out)
          }
        }
      }.toMap
    lastScanStats = stats
    if (prunedOut.isEmpty) return None

    // Subtract the pruned-out files from the analyzed plan's own scan
    // leaves: the relation keeps its output attributes (exprIds), so the
    // rest of the plan — MoR anti-joins, field-id projections, the user's
    // filters — stays bound exactly as analyzed. Strip scheme/authority
    // like GraftFileIndex: leaves render `file:/p`, manifests plain `/p`.
    def canon(p: String): String =
      p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/*", "/")
    val analyzed = d.queryExecution.analyzed
    var changed = false
    val swapped = analyzed.transformUp {
      case lr: LogicalRelation =>
        ownerOf(lr).filter(prunedOut.contains) match {
          case Some(ident) => lr.relation match {
            // partitionSchema must be empty: the replacement index forces
            // PartitionSpec.emptySpec, so a relation that surfaced
            // partition columns would lose them (graft reads list leaf
            // FILES with an explicit schema, so this is always empty in
            // practice — the guard keeps it conservative, not load-bearing)
            case fs: HadoopFsRelation if fs.partitionSchema.isEmpty =>
              val out = prunedOut(ident).map(canon)
              val keptPaths = fs.location.rootPaths
                .filterNot(p => out(canon(p.toString)))
              if (keptPaths.size == fs.location.rootPaths.size) lr
              else if (keptPaths.isEmpty) {
                changed = true
                org.apache.spark.sql.catalyst.plans.logical
                  .LocalRelation(lr.output)
              } else {
                changed = true
                val kset = keptPaths.map(p => canon(p.toString)).toSet
                val idx = new org.apache.spark.sql.graft.GraftFileIndex(
                  spark, keptPaths, fs.dataSchema, _ => kset)
                lr.copy(relation = fs.copy(location = idx)(fs.sparkSession))
              }
            case _ => lr
          }
          case None => lr
        }
    }
    if (!changed) None
    else Some(org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, swapped))
  }

  /** Time-travel query: the NAMED table resolves at the given
    * snapshot-id/timestamp (query.py:169-197); any OTHER table the SQL
    * references resolves fresh at its current snapshot — without that, a
    * join against a second table would bind to whatever (possibly stale)
    * view an earlier query happened to leave behind. The asof view is
    * registered LAST so the per-query registration can never clobber it,
    * and the current view is restored after analysis. */
  def executeAsOf(table: String, sql: String, asOf: String,
      maxRows: Int = 1000): DataFrame = {
    val (ns, short) = graft.core.Catalog.parseIdent(table)
    val rewritten = rewriteNamespaces(sql)
    val df = analysisLock.synchronized {
      registerReferenced(rewritten)
      // the asof frame replaces BOTH of the table's view names — the
      // per-query registration above just bound them to the CURRENT
      // snapshot, and a query using the `ns__table` alias must not
      // silently read current data instead of the requested snapshot
      val asOfDf = lh.catalog.loadTable(table).readAsOf(asOf)
      asOfDf.createOrReplaceTempView(short)
      asOfDf.createOrReplaceTempView(s"${ns}__$short")
      // analyze the REWRITTEN text, like execute(): `ns.table` references
      // must resolve through the alias views here too
      try spark.sql(rewritten)
      finally {
        // restore the CURRENT views: the asof binding must not leak into
        // later queries (same rule as the narrowed pruning views)
        try lh.catalog.registerView(table)
        catch { case _: Exception =>
          spark.catalog.dropTempView(short)
          spark.catalog.dropTempView(s"${ns}__$short")
        }
      }
    }
    // same `maxRows <= 0 disables` convention as execute() — limit(0)
    // would silently return zero rows
    if (maxRows > 0 && needsLimit(sql)) df.limit(maxRows) else df
  }

  /** Federated multi-table join query (joins.py:58-93). */
  def executeJoin(sql: String, maxRows: Int = 10000): DataFrame =
    execute(sql, maxRows)

  /** Tables referenced by a SQL string, from the PARSED plan's unresolved
    * relations — not the reference's substring matching (matviews.py:35-51),
    * which false-positives on column names. `collectWithSubqueries`, not
    * `collect`: a table referenced ONLY inside a scalar/IN/EXISTS subquery
    * expression must register too (plain collect does not descend into
    * subquery expression plans — the per-query lazy registration would
    * miss it, or worse, bind it to a STALE view from an earlier query). */
  def referencedTables(sql: String): Seq[String] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    plan.collectWithSubqueries {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.distinct.map(n => n.replace("__", "."))
  }

  /** Dry-run validation: parse, then analyze against registered views
    * (pipelines.py:159-167 uses EXPLAIN). Throws on invalid SQL. */
  def validateSql(sql: String): Unit = {
    val rewritten = rewriteNamespaces(sql)
    registerReferenced(rewritten)
    spark.sql(rewritten).queryExecution.analyzed
  }

  private def recordLineage(sql: String): Unit = ()

  /** Equi-join candidates from matching column names across tables, with a
    * ready-to-run join SQL template (reference suggest_joins,
    * joins.py:191-237). Pure metadata walk — no data touched. */
  def suggestJoins(): Seq[(String, String, String, String)] = {
    val tables = lh.catalog.listTables("*")
    val schemas = tables.map(t => t -> lh.catalog.loadTable(t).schema.fieldNames.toSet)
    for {
      (ta, ca) <- schemas
      (tb, cb) <- schemas if ta < tb
      shared <- (ca intersect cb).toSeq.sorted
    } yield (ta, tb, shared,
      s"SELECT * FROM ${ta.replace(".", "__")} a JOIN ${tb.replace(".", "__")} b" +
        s" ON a.$shared = b.$shared")
  }
}
