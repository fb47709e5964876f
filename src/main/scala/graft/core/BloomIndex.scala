package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Point-lookup file skipping via parquet's NATIVE bloom filters — the
  * third manifest-pruning layer, after partition directories and
  * min/max bounds ([[FilePruning]]).
  *
  * Bounds answer range predicates on CLUSTERED layouts; they are
  * useless for `id = 123` on a column whose values are scattered (every
  * file's [min, max] straddles every id). Blooms answer exactly that:
  * opt a column in with the `graft.bloom.columns` table property and
  * every commit writes parquet bloom pages for it
  * (`parquet.bloom.filter.enabled#col`); `prunedRead(col === v)` then
  * probes each surviving file's bloom and drops files that provably
  * don't hold the value.
  *
  * Why probe at plan time instead of storing bitmaps in the manifest: a
  * useful bloom for a 1M-row file is ~1.2 MB; embedding one per (file,
  * column) would bloat the manifest by orders of magnitude (which is why
  * Iceberg keeps blooms in the data files too). The probe reads one
  * footer + one bloom page (~KB) per candidate file — vs scanning the
  * file, the 100 TB point-lookup win — and only runs when an equality
  * conjunct targets an opted-in column.
  *
  * Three-valued like the other layers: any miss (no bloom written, type
  * changed by evolution, unreadable file, unsupported type) keeps the
  * file; the exact filter re-applies after the read, so a wrong prune is
  * structurally impossible.
  */
object BloomIndex {

  val PropKey = "graft.bloom.columns"

  /** Columns opted into bloom indexing for this table. */
  def bloomColumns(props: Map[String, String]): Set[String] =
    props.get(PropKey).iterator
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).toSet

  /** Parquet writer options enabling bloom pages for the opted-in
    * columns (passed through by the Spark parquet sink per column). */
  def writeOptions(props: Map[String, String]): Map[String, String] =
    bloomColumns(props).map(c =>
      s"parquet.bloom.filter.enabled#$c" -> "true").toMap

  /** Can `f` possibly satisfy every equality conjunct, judged by its
    * bloom pages? Only `field = value` conjuncts on `bloomCols` are
    * consulted; column names resolve through the file's write-time
    * schema BY FIELD-ID (renames survive; a type change disables the
    * probe for that file). */
  def keepFile(f: FileEntry, conjs: Seq[FilePruning.Conjunct],
      schema: StructType, fileSchemaOf: Int => Option[StructType],
      bloomCols: Set[String], conf: Configuration): Boolean =
    conjs.forall { c =>
      val vals = c.op match {
        case "=" if c.value.nonEmpty => c.value.toSeq
        case "in" if c.values.nonEmpty => c.values
        case _ => Nil
      }
      if (vals.isEmpty || !bloomCols.contains(c.field)) true
      else {
        val probed = for {
          cur <- schema.fields.find(_.name == c.field)
          id <- TableMeta.fieldId(cur)
          ff <- fileSchemaOf(f.schemaId).getOrElse(schema).fields
            .find(x => TableMeta.fieldId(x).contains(id))
          if ff.dataType == cur.dataType
        } yield mightContainAny(f.path, ff.name, ff.dataType, vals, conf)
        probed.getOrElse(true)
      }
    }

  /** Probe the bloom pages of every row group: false ONLY when each
    * group has a bloom and every bloom proves absence. Any anomaly
    * keeps the file. */
  def mightContain(path: String, colName: String, dt: DataType,
      canonical: String, conf: Configuration): Boolean =
    mightContainAny(path, colName, dt, Seq(canonical), conf)

  /** [[mightContain]] for a value LIST in one footer read: true when any
    * row group might hold any of the values (an IN-list probe is one
    * file open, not one per element). */
  def mightContainAny(path: String, colName: String, dt: DataType,
      canonicals: Seq[String], conf: Configuration): Boolean =
    try {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf)
      val r = ParquetFileReader.open(in)
      try {
        r.getRowGroups.asScala.exists { blk =>
          blk.getColumns.asScala
            .find(_.getPath.toDotString == colName) match {
            case None => true // column absent (e.g. dir-encoded partition)
            case Some(cmd) =>
              val bf = r.getBloomFilterDataReader(blk).readBloomFilter(cmd)
              if (bf == null) true // no bloom page written for this group
              else canonicals.exists(canonical =>
                hashOf(bf, dt, canonical) match {
                  case Some(h) => bf.findHash(h)
                  case None => true
                })
          }
        }
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => true }

  /** Hash a canonical-string literal with the bloom's hasher, matching
    * the column's parquet PHYSICAL type (INT32 hashes as int, INT64 as
    * long, strings as Binary). Canonical encodings follow [[ColBounds]]:
    * dates are epoch days, timestamps epoch micros, floats the normFp
    * double rendering. */
  private def hashOf(
      bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
      dt: DataType, canonical: String): Option[Long] =
    try dt match {
      case ByteType | ShortType | IntegerType | DateType =>
        Some(bf.hash(canonical.toLong.toInt))
      case LongType | TimestampType | TimestampNTZType =>
        Some(bf.hash(canonical.toLong))
      case FloatType => Some(bf.hash(canonical.toDouble.toFloat))
      case DoubleType => Some(bf.hash(canonical.toDouble))
      case StringType => Some(bf.hash(Binary.fromString(canonical)))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }
}
