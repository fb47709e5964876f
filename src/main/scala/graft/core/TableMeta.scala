package graft.core

import org.apache.spark.sql.types.{DataType, Metadata, MetadataBuilder, StructField, StructType}

/** Per-file, per-column value bounds from the parquet footer, keyed by the
  * column's FIELD-ID (not name — renames must not orphan stats). `min`/`max`
  * are canonical strings of the column's logical type (integral/timestamp
  * micros/date days as longs, floating point via `java.lang.Double
  * .toString`, strings verbatim, booleans `true`/`false`); absent when the
  * footer had no usable statistics for the column. Parquet guarantees
  * min <= all values <= max even when string stats are truncated, so the
  * bounds are always safe for pruning. */
case class ColBounds(min: Option[String] = None, max: Option[String] = None,
    nulls: Option[Long] = None)

/** One data file tracked by a snapshot. `schemaId` records which schema
  * version the file was written under, so reads after rename/drop/add
  * evolution can resolve columns by field-id per file group. `bounds`
  * (field-id → [[ColBounds]], collected once from the parquet footer at
  * commit time) lets [[IceTable.prunedRead]] drop whole files by predicate
  * BEFORE Catalyst ever lists them — at 1000-executor scale the difference
  * between opening every file of a 100 TB table and opening the few a
  * range predicate can touch. Older manifests deserialize with an empty
  * map (= unknown = never pruned). */
case class FileEntry(path: String, rows: Long, bytes: Long, schemaId: Int = 1,
    bounds: Map[String, ColBounds] = Map.empty)

/** One table version. Every write commits a new snapshot whose `files` list
  * is the COMPLETE set of live data files at that version (append = parent
  * files + new files; overwrite = new files only) — mirroring the Iceberg
  * snapshot model the reference exposes (reference catalog.py:204-237).
  *
  * `deleteFiles` (empty on old manifests — json4s falls back to the
  * default) are merge-on-read POSITION deletes, the Iceberg-v2 idea: each
  * is a small parquet file of `(file_path, pos)` rows naming individual
  * data-file rows that are logically deleted at this version. Reads
  * subtract them with an anti-join; a small delete against a 100 TB table
  * costs KBs of new data instead of rewriting TBs (the copy-on-write
  * path, which remains the default).
  *
  * ON DISK the file lists live in append-only manifest files, not in the
  * snapshot log: `manifestList` points at a [[ManifestList]] and the log
  * entry stores EMPTY `files`/`deleteFiles`/`eqDeleteFiles` — so each
  * commit appends O(new files) manifest bytes plus one constant-size log
  * entry, instead of rewriting every snapshot's full file list
  * (O(snapshots × files) per commit — at 10⁵–10⁶ files and thousands of
  * commits, the manifest-list problem Iceberg's avro manifests solve).
  * IN MEMORY, [[graft.core.IceTable]] resolves the pointer back into the
  * inline lists before handing a Snapshot to any caller, so the rest of
  * the engine never sees the difference. Entries with `manifestList`
  * absent are the legacy inline format and stay readable. */
case class Snapshot(
    id: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | overwrite | replace | delete
    files: List[FileEntry],
    schemaId: Int,
    summary: Map[String, String] = Map.empty,
    deleteFiles: List[FileEntry] = Nil,
    eqDeleteFiles: List[EqDeleteEntry] = Nil,
    manifestList: Option[String] = None) {
  def totalRows: Long = files.map(_.rows).sum
  def totalBytes: Long = files.map(_.bytes).sum
  /** Physical rows minus merge-on-read deleted rows. Exact: position
    * delete files are written from the all-deletes-applied read (a
    * position is never deleted twice), and equality entries record their
    * matched count against the same base restricted to their covered
    * files — the three sets are disjoint by construction. */
  def liveRows: Long = totalRows - deleteFiles.map(_.rows).sum -
    eqDeleteFiles.map(_.rows).sum
}

/** Merge-on-read EQUALITY delete (the second Iceberg-v2 delete flavor):
  * `dir` holds parquet of distinct KEY VALUES over `cols`; a read drops
  * rows matching any key — but only rows in data files committed at or
  * before `coveredUpTo` (the snapshot id current when the delete
  * committed), so later appends of the same keys are NOT retro-deleted.
  * This is exactly Iceberg's sequence-number rule: commit ids are
  * monotone and every data file's id is recoverable from its
  * `data/commit-NNNNN/` path, so the read-side membership test is one
  * scalar comparison — O(1) plan size regardless of table file count
  * (an explicit covered-file list would inline 10⁵–10⁶ path literals
  * into every read plan at 100 TB scale).
  * `cols` are the key column NAMES at write time (they also name the
  * columns inside the key parquet); `colIds` are the same keys' stable
  * field-ids, so reads resolve to CURRENT names after a rename — the
  * Iceberg v2 `equality_ids` idea. `rows` = matched LOGICAL rows at
  * commit (for exact liveRows); `keyRows` = distinct keys (broadcast
  * sizing). */
case class EqDeleteEntry(dir: String, rows: Long, keyRows: Long,
    bytes: Long, cols: List[String], coveredUpTo: Long,
    colIds: List[Long] = Nil)

/** A staged WRITE-AUDIT-PUBLISH commit (registry entry under
  * `table/staged/<wapId>.json`): data already written to `dir` under
  * `schemaId`, referenced by NO snapshot until [[IceTable.publishWap]]
  * renames it into a real commit. The registry pins the dir against
  * orphan GC while staged. */
case class StagedCommit(wapId: String, dir: String, schemaId: Int,
    rows: Long, files: Int, createdMs: Long)

/** A schema version: Spark StructType JSON + stable field-ids in field
  * metadata (key [[TableMeta.FieldIdKey]]) so rename/drop evolve by id,
  * not by name (reference schema_evolution.py:122-172). */
case class SchemaVersion(id: Int, structJson: String) {
  def struct: StructType = DataType.fromJson(structJson).asInstanceOf[StructType]
}

case class TableMeta(
    namespace: String,
    name: String,
    schemas: List[SchemaVersion],
    currentSchemaId: Int,
    partitionSpec: List[String], // serialized transforms, see PartitionTransform
    properties: Map[String, String],
    // specs this table was PREVIOUSLY partitioned by (partition evolution:
    // IceTable.updatePartitionSpec) — old files keep their old directory
    // layout forever, so pruning must remember how they were written.
    // Default Nil keeps every pre-evolution meta JSON readable.
    previousPartitionSpecs: List[List[String]] = Nil) {
  def ident: String = s"$namespace.$name"
  def schema: StructType = schemas.find(_.id == currentSchemaId).get.struct
  def transforms: List[PartitionTransform] = partitionSpec.map(PartitionTransform.parse)

  /** Transforms from EVERY spec this table has ever had, for pruning: a
    * file carries partition dirs only for the spec era it was written
    * under, and [[FilePruning.keepFileByPartitions]] keeps a file
    * whenever a transform's dir is absent — so evaluating all eras prunes
    * each file by exactly the dirs it has. A dir NAME written by two
    * different transforms across eras (truncate(2,c) → truncate(4,c):
    * both are `_p_c_trunc`) is ambiguous on disk and excluded — pruning
    * by the wrong width would drop live files. */
  def allTransforms: List[PartitionTransform] = {
    // distinct on the PARSED transform, not the spec string: a bare `g`
    // era and a normalized `identity(g)` era (renameColumn emits the
    // normalized form) are the same transform, and letting both survive
    // would trip the name-collision exclusion below and silently disable
    // pruning on that dir for no reason
    val all = (partitionSpec :: previousPartitionSpecs)
      .flatten.map(PartitionTransform.parse).distinct
    all.groupBy(_.name).valuesIterator.filter(_.size == 1).map(_.head).toList
  }
}

object TableMeta {
  val FieldIdKey = "graft.field-id"

  def fieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(FieldIdKey)) Some(f.metadata.getLong(FieldIdKey)) else None

  def withFieldId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(FieldIdKey, id).build())

  /** Assign field-ids 1..n to any fields missing one (fresh table DDL).
    * `floor` raises the starting id — evolution passes the max id ever
    * used across ALL schema versions so dropped columns' ids are never
    * reused (see IceTable.evolveSchema). */
  def assignFieldIds(schema: StructType, floor: Long = 0L): StructType = {
    val maxExisting = math.max(floor,
      schema.fields.flatMap(fieldId).foldLeft(0L)(math.max))
    var next = maxExisting
    StructType(schema.fields.map { f =>
      fieldId(f) match {
        case Some(_) => f
        case None => next += 1; withFieldId(f, next)
      }
    })
  }

  /** User-facing type-name mapping of the reference (catalog.py:1091-1100):
    * int widens to long, float widens to double. */
  def parseTypeName(s: String): DataType = {
    import org.apache.spark.sql.types._
    s.toLowerCase match {
      case "string"                    => StringType
      case "long" | "int" | "integer"  => LongType
      case "double" | "float"          => DoubleType
      case "timestamp" | "timestamptz" => TimestampType
      case "date"                      => DateType
      case "boolean" | "bool"          => BooleanType
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }
  }

  /** Build an all-nullable schema from (name, typeName) pairs — the
    * reference's create_table DDL shape (catalog.py:2261-2367). */
  def schemaOf(columns: Seq[(String, String)]): StructType =
    assignFieldIds(StructType(columns.map { case (n, t) =>
      StructField(n, parseTypeName(t), nullable = true)
    }))
}
