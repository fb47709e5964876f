package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg-style partition transforms (reference catalog.py:2192-2258).
  *
  * A transform maps a source column to a derived partition value. At write
  * time the derived value becomes a `_p_<name>` directory column
  * (`df.write.partitionBy`), while the source column stays in the data file —
  * the same layout real Iceberg uses, so reads of explicit file lists never
  * lose columns and partition dirs exist purely for pruning + organization.
  */
sealed trait PartitionTransform {
  def source: String
  /** Name of the derived partition column (also the dir key). */
  def name: String
  /** Spark expression computing the partition value from the source column. */
  def column: Column
  /** Type-aware variant; transforms whose semantics depend on the source
    * type (truncate) override this. Called by the write path with the
    * actual column type. */
  def columnFor(dt: org.apache.spark.sql.types.DataType): Column = column
  /** Serialized form, parseable by [[PartitionTransform.parse]]. */
  def spec: String
}

object PartitionTransform {
  val DirPrefix = "_p_"

  case class Identity(source: String) extends PartitionTransform {
    def name = s"$DirPrefix$source"
    def column = col(source)
    def spec = s"identity($source)"
  }
  case class Year(source: String) extends PartitionTransform {
    def name = s"$DirPrefix${source}_year"
    def column = year(col(source))
    def spec = s"year($source)"
  }
  case class Month(source: String) extends PartitionTransform {
    def name = s"$DirPrefix${source}_month"
    def column = date_format(col(source), "yyyy-MM")
    def spec = s"month($source)"
  }
  case class Day(source: String) extends PartitionTransform {
    def name = s"$DirPrefix${source}_day"
    def column = date_format(col(source), "yyyy-MM-dd")
    def spec = s"day($source)"
  }
  case class Hour(source: String) extends PartitionTransform {
    def name = s"$DirPrefix${source}_hour"
    def column = date_format(col(source), "yyyy-MM-dd-HH")
    def spec = s"hour($source)"
  }
  case class Bucket(n: Int, source: String) extends PartitionTransform {
    def name = s"$DirPrefix${source}_bucket"
    def column = pmod(hash(col(source)), lit(n))
    def spec = s"bucket($n,$source)"
  }
  case class Truncate(n: Int, source: String) extends PartitionTransform {
    def name = s"$DirPrefix${source}_trunc"
    // Untyped fallback: string prefix.
    def column = substring(col(source).cast("string"), 1, n)
    // Iceberg semantics by type: integral values floor to a multiple of n
    // (v - ((v % n + n) % n), correct for negatives); strings take a prefix.
    override def columnFor(dt: org.apache.spark.sql.types.DataType): Column = {
      import org.apache.spark.sql.types._
      dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(source) - pmod(col(source), lit(n).cast(dt))
        case _ => column
      }
    }
    def spec = s"truncate($n,$source)"
  }

  private val TwoArg = """(\w+)\(\s*(\d+)\s*,\s*([\w.]+)\s*\)""".r
  private val OneArg = """(\w+)\(\s*([\w.]+)\s*\)""".r

  /** Parse `identity(c)` / `year(c)` / `bucket(16,c)` / bare `c`. */
  def parse(s: String): PartitionTransform = s.trim match {
    case TwoArg("bucket", n, c)   => Bucket(n.toInt, c)
    case TwoArg("truncate", n, c) => Truncate(n.toInt, c)
    case OneArg("identity", c)    => Identity(c)
    case OneArg("year", c)        => Year(c)
    case OneArg("month", c)       => Month(c)
    case OneArg("day", c)         => Day(c)
    case OneArg("hour", c)        => Hour(c)
    case OneArg(other, _) =>
      throw new IllegalArgumentException(s"unknown partition transform: $other")
    case bare if bare.nonEmpty && !bare.contains("(") => Identity(bare)
    case other =>
      throw new IllegalArgumentException(s"cannot parse partition spec: $other")
  }

  /** The same transform over a renamed source column (schema evolution:
    * column renames carry the partition spec — see IceTable.renameColumn).
    * Structural, not string surgery: bare identity specs (`g`, as stored
    * verbatim by createTable and emitted by the SQL bridge for
    * `PARTITIONED BY (col)`) have no parens to splice. */
  def withSource(t: PartitionTransform, to: String): PartitionTransform =
    t match {
      case Identity(_)    => Identity(to)
      case Year(_)        => Year(to)
      case Month(_)       => Month(to)
      case Day(_)         => Day(to)
      case Hour(_)        => Hour(to)
      case Bucket(n, _)   => Bucket(n, to)
      case Truncate(n, _) => Truncate(n, to)
    }
}
