package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.SQLContext

import graft.core.IceTable

/** SQL metadata tables — `SELECT * FROM cat.ns.t.snapshots` (Iceberg's
  * metadata-table UX): inspection of a table's commit history, current
  * files, delete state, tags and properties from plain SQL. Each is a
  * driver-built, metadata-sized frame (snapshot log entries are manifest
  * POINTERS — building these never touches a data file), refreshed per
  * query planning. Read-only by construction (no SupportsWrite face). */
object GraftMetaTables {

  val Names: Set[String] =
    Set("snapshots", "history", "files", "delete_files", "tags", "properties",
      "partitions")

  /** Faces whose schema depends on the base table (the changelog carries
    * the table's own columns), so they can't live in the static [[Schemas]]
    * map. `changes` mirrors Iceberg's `table_changes` UX: every commit in a
    * range replayed as `(row…, _change_type, _commit_id)` records via
    * [[graft.streaming.Changelog.changesBetween]] — appends read only their
    * added files, MoR deletes replay O(touched), compactions replay empty.
    * Bounds ride read options (`spark.read.option("from_id", …)
    * .option("to_id", …).table("cat.ns.t.changes")`): `from_id` exclusive,
    * `to_id` inclusive, defaults = the full retained log. Plain SQL without
    * options gets the full log and can filter on `_commit_id` (the
    * changelog is built per commit, so a residual filter is correct, just
    * not commit-pruned — pass the option to prune). */
  val DynamicNames: Set[String] = Set("changes")

  /** Every routable metadata face. */
  val AllNames: Set[String] = Names ++ DynamicNames

  /** Static per-face schemas: `Table.schema()` is called repeatedly during
    * analysis and must not rebuild the frame (and re-read the snapshot
    * log) each time. Drift against [[frame]]'s actual output is refused by
    * a GraftCatalogSpec assert over every face. */
  val Schemas: Map[String, StructType] = {
    import org.apache.spark.sql.types._
    def st(fs: (String, DataType)*) =
      StructType(fs.map { case (n, t) => StructField(n, t) })
    Map(
      "snapshots" -> st("snapshot_id" -> LongType,
        "parent_id" -> LongType, "committed_at" -> TimestampType,
        "operation" -> StringType, "data_files" -> LongType,
        "position_delete_files" -> LongType,
        "equality_delete_entries" -> LongType, "total_rows" -> LongType,
        "live_rows" -> LongType, "total_bytes" -> LongType,
        "summary" -> MapType(StringType, StringType)),
      "history" -> st("made_current_at" -> TimestampType,
        "snapshot_id" -> LongType, "parent_id" -> LongType,
        "is_current_ancestor" -> BooleanType),
      "files" -> st("file_path" -> StringType, "schema_id" -> IntegerType,
        "record_count" -> LongType, "file_size_in_bytes" -> LongType),
      "delete_files" -> st("delete_type" -> StringType, "path" -> StringType,
        "matched_rows" -> LongType, "bytes" -> LongType,
        "equality_columns" -> StringType),
      "tags" -> st("tag" -> StringType, "snapshot_id" -> LongType),
      "properties" -> st("key" -> StringType, "value" -> StringType),
      "partitions" -> st("partition" -> StringType,
        "data_files" -> LongType, "row_count" -> LongType,
        "total_bytes" -> LongType))
  }

  def apply(spark: SparkSession, tbl: () => IceTable, fullName: String,
      meta: String): Table = new GraftMetaTable(spark, tbl,
    s"$fullName.$meta", meta)

  /** The per-table schema of a dynamic face. Metadata-sized: reads the
    * table's schema, never builds the changelog. `_changed_columns` is
    * ALWAYS declared (empty arrays when no `pair_keys` option is given):
    * read options are not available when analysis asks for the schema,
    * so the face's shape cannot depend on them. */
  private[engine] def dynamicSchema(t: IceTable, meta: String): StructType =
    meta match {
      case "changes" =>
        import org.apache.spark.sql.types._
        StructType(t.schema.fields ++ Seq(
          StructField(graft.streaming.Changelog.ChangeTypeCol, StringType),
          StructField(graft.streaming.Changelog.CommitIdCol, LongType),
          StructField(graft.streaming.Changelog.ChangedColumnsCol,
            ArrayType(StringType))))
      case other =>
        throw new IllegalArgumentException(s"unknown dynamic face: $other")
    }

  private[engine] def frame(spark: SparkSession, t: IceTable,
      meta: String, options: Map[String, String] = Map.empty): DataFrame = {
    val impl = spark.implicits
    import impl._
    meta match {
      case "changes" =>
        import org.apache.spark.sql.functions.{array, col}
        // one raw-log read serves the head id AND the strict-from check —
        // currentSnapshot would resolve the head's manifest list just to
        // take its id, and a second rawLog read would re-parse the
        // O(history) log file
        val logRefs = t.rawLog
        val head = logRefs.lastOption.map(_.id)
        // `__pushed_lo`/`__pushed_hi` carry `_commit_id` FILTER bounds the
        // scan builder extracted (see GraftMetaTable): filter semantics,
        // not consumer-offset semantics — an expired lower bound replays
        // the retained commits in range instead of refusing
        val pushedLo = options.get("__pushed_lo").map(_.toLong)
        val pushedHi = options.get("__pushed_hi").map(_.toLong)
        val strictFrom = options.get("from_id").map(_.toLong)
        val fromId = (strictFrom.toList ++ pushedLo.toList)
          .reduceOption(math.max(_, _))
        val toId = (options.get("to_id").map(_.toLong).toList ++
          pushedHi.toList).reduceOption(math.min(_, _)).orElse(head)
        // The offset-consumer contract (refuse on an expired resume point)
        // holds for an EXPLICIT from_id even when a higher pushed
        // `_commit_id` bound supersedes it as the effective replay start —
        // validate strictFrom's retention here, independently of the
        // effective bound, so an extra WHERE clause can never silently
        // waive the user's resume-point guarantee. Pushed-only bounds are
        // filter semantics and replay whatever retained commits remain.
        // Membership tests against rawLog (constant-size entries): a
        // 500k-commit table must not resolve every manifest list just to
        // check one id. A zero-commit table skips the check — nothing was
        // ever expired there; it replays empty below like always.
        if (head.isDefined) strictFrom.foreach { f =>
          require(logRefs.exists(_.id == f),
            s"from-snapshot $f is not in the retained log — it may have " +
              "been expired; re-seed the consumer from a full read")
        }
        // `pair_keys` (comma-separated primary key) pairs each update
        // commit's delete+insert rows into update_before/update_after
        // records with the real changed-column set — Iceberg's
        // create_changelog_view(identifier_columns) UX; without it the
        // declared `_changed_columns` column holds empty arrays
        val pairKeys = options.get("pair_keys")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val raw = toId match {
          case Some(to) =>
            graft.streaming.Changelog.changesBetween(t, fromId, to, pairKeys,
              requireFromRetained = false) // strictFrom validated above
          case None => // empty table: zero commits, changelog-shaped frame
            t.emptyDf(dynamicSchema(t, "changes"))
        }
        val withChanged =
          if (raw.columns.contains(graft.streaming.Changelog.ChangedColumnsCol))
            raw
          else raw.withColumn(graft.streaming.Changelog.ChangedColumnsCol,
            array().cast("array<string>"))
        // force the DECLARED column order: analysis resolves against
        // dynamicSchema while the V1 bridge emits rows positionally from
        // this frame — an order mismatch would silently swap columns
        withChanged.select(dynamicSchema(t, "changes").fieldNames
          .map(col).toSeq: _*)
      case "snapshots" =>
        t.snapshots.map { s =>
          (s.id, s.parentId, new java.sql.Timestamp(s.timestampMs),
            s.operation, s.files.size.toLong, s.deleteFiles.size.toLong,
            s.eqDeleteFiles.size.toLong, s.totalRows, s.liveRows,
            s.totalBytes, s.summary)
        }.toDF("snapshot_id", "parent_id", "committed_at", "operation",
          "data_files", "position_delete_files", "equality_delete_entries",
          "total_rows", "live_rows", "total_bytes", "summary")
      case "history" =>
        // is_current_ancestor follows the STATE lineage, like Iceberg's
        // history table: the log itself is linear (a rollback commits a
        // NEW snapshot, parent = previous head), but the rollback's
        // CONTENT re-references its target — so ancestry walks from the
        // head jumping through `rolled-back-to`, and the commits a
        // rollback discarded report false
        val all = t.snapshots
        val byId = all.map(s => s.id -> s).toMap
        def stateParent(s: graft.core.Snapshot): Option[Long] =
          s.summary.get("rolled-back-to").map(_.toLong).orElse(s.parentId)
        val ancestors = scala.collection.mutable.Set[Long]()
        var cur = t.currentSnapshot
        while (cur.isDefined && !ancestors.contains(cur.get.id)) {
          ancestors += cur.get.id
          cur = stateParent(cur.get).flatMap(byId.get)
        }
        all.map { s =>
          (new java.sql.Timestamp(s.timestampMs), s.id, s.parentId,
            ancestors.contains(s.id))
        }.toDF("made_current_at", "snapshot_id", "parent_id",
          "is_current_ancestor")
      case "files" =>
        t.currentSnapshot.map(_.files).getOrElse(Nil).map { f =>
          (f.path, f.schemaId, f.rows, f.bytes)
        }.toDF("file_path", "schema_id", "record_count", "file_size_in_bytes")
      case "delete_files" =>
        val pos = t.currentSnapshot.map(_.deleteFiles).getOrElse(Nil)
          .map(f => ("position", f.path, f.rows, f.bytes, ""))
        val eq = t.currentSnapshot.map(_.eqDeleteFiles).getOrElse(Nil)
          .map(e => ("equality", e.dir, e.rows, e.bytes,
            e.cols.mkString(",")))
        (pos ++ eq).toDF("delete_type", "path", "matched_rows", "bytes",
          "equality_columns")
      case "tags" =>
        t.tags.toSeq.sortBy(_._1).map { case (n, id) => (n, id) }
          .toDF("tag", "snapshot_id")
      case "properties" =>
        t.meta.properties.toSeq.sortBy(_._1)
          .toDF("key", "value")
      case "partitions" =>
        // Iceberg's `partitions` metadata table: per-partition file/row/
        // byte stats from manifests + dir names — never opens a data file
        t.partitionStats.toSeq.sortBy(_._1)
          .map { case (p, (files, rows, bytes)) => (p, files, rows, bytes) }
          .toDF("partition", "data_files", "row_count", "total_bytes")
      case other =>
        throw new IllegalArgumentException(s"unknown metadata table: $other")
    }
  }
}

/** One metadata table face: schema from a probe build, rows re-derived
  * from the live table state at scan time through the internal-row
  * `V1Scan` bridge (driver-local, metadata-sized). */
private class GraftMetaTable(spark: SparkSession, tblOf: () => IceTable,
    tableName: String, meta: String) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType =
    if (GraftMetaTables.DynamicNames.contains(meta))
      GraftMetaTables.dynamicSchema(tblOf(), meta)
    else GraftMetaTables.Schemas(meta)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      // `_commit_id` bounds from plain-SQL WHERE clauses, pruning the
      // changes face's replay to the requested commit range — without
      // this, `WHERE _commit_id > N` would replay the ENTIRE retained
      // log and filter residually (at large-table scale: every commit's
      // touched files for a query asking about the last few commits),
      // and would refuse outright once older commits' parents expire.
      // Conservative fold; every filter stays residual (Spark re-applies
      // them), so pruning can only skip whole out-of-range commits.
      private var lo: Option[Long] = None // exclusive
      private var hi: Option[Long] = None // inclusive
      private var accepted: Array[org.apache.spark.sql.sources.Filter] =
        Array.empty

      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        import org.apache.spark.sql.sources._
        if (meta == "changes") {
          val cid = graft.streaming.Changelog.CommitIdCol
          def num(v: Any): Option[Long] = v match {
            case l: Long => Some(l)
            case i: Int => Some(i.toLong)
            case _ => None
          }
          filters.foreach {
            case GreaterThan(c, v) if c == cid =>
              num(v).foreach(n => lo = Some(math.max(lo.getOrElse(n), n)))
            case GreaterThanOrEqual(c, v) if c == cid =>
              num(v).foreach(n =>
                lo = Some(math.max(lo.getOrElse(n - 1), n - 1)))
            case LessThan(c, v) if c == cid =>
              num(v).foreach(n =>
                hi = Some(math.min(hi.getOrElse(n - 1), n - 1)))
            case LessThanOrEqual(c, v) if c == cid =>
              num(v).foreach(n => hi = Some(math.min(hi.getOrElse(n), n)))
            case EqualTo(c, v) if c == cid =>
              num(v).foreach { n =>
                lo = Some(math.max(lo.getOrElse(n - 1), n - 1))
                hi = Some(math.min(hi.getOrElse(n), n))
              }
            case _ => ()
          }
          accepted = filters.filter {
            case GreaterThan(c, _) => c == cid
            case GreaterThanOrEqual(c, _) => c == cid
            case LessThan(c, _) => c == cid
            case LessThanOrEqual(c, _) => c == cid
            case EqualTo(c, _) => c == cid
            case _ => false
          }
        }
        filters // ALL residual — pruning is an optimization, never exact
      }

      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        accepted

      override def build(): Scan = {
        // pin the frame at scan build: schema and rows must agree within
        // one query even if a commit lands mid-planning
        import scala.jdk.CollectionConverters._
        val df = GraftMetaTables.frame(spark, tblOf(), meta,
          options.asScala.toMap ++
            lo.map(n => "__pushed_lo" -> n.toString) ++
            hi.map(n => "__pushed_hi" -> n.toString))
        new V1Scan {
          override def readSchema(): StructType = df.schema
          override def toV1TableScan[T <: BaseRelation with TableScan](
              context: SQLContext): T =
            new BaseRelation with TableScan {
              override def sqlContext: SQLContext = context
              override def schema: StructType = df.schema
              override val needConversion: Boolean = false
              override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
                df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
                  .queryExecution.toRdd
                  .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
            }.asInstanceOf[T]
        }
      }
    }
}
