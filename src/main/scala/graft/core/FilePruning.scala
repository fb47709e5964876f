package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Manifest-level file pruning by predicate against the per-file column
  * bounds collected at commit time ([[FileEntry.bounds]]).
  *
  * The evaluation is deliberately THREE-VALUED: a conjunct either proves a
  * file cannot contain a matching row (drop) or it cannot (keep). Any
  * predicate shape this module doesn't understand — casts, functions,
  * disjunctions, non-literal comparands — simply never prunes; the exact
  * `.where(filter)` applied after the pruned read keeps semantics identical
  * to an unpruned read in every case. That makes the prune safe to run on
  * arbitrary user predicates.
  *
  * All bound values are canonical strings ([[ColBounds]]); comparisons
  * happen in the column's logical domain. Strings compare by UNSIGNED
  * UTF-8 bytes — the ordering BOTH parquet uses for binary min/max and
  * Spark's UTF8String uses, and NOT what java.lang.String.compareTo does
  * (UTF-16 code units diverge on supplementary characters).
  */
object FilePruning {

  /** One prunable conjunct: `op` ∈ =, <, <=, >, >=, isnull, isnotnull
    * (with `value` already canonicalized to the column's domain), or a
    * literal IN-list (`op` = in, every element canonicalized into
    * `values` — the conjunct is kept ONLY when every element
    * canonicalizes, since an opaque element could match anything). */
  case class Conjunct(field: String, op: String, value: Option[String],
      values: Seq[String] = Nil)

  // ---- canonical-domain comparison ----------------------------------------

  /** Unsigned byte-wise UTF-8 comparison (parquet binary stats order ==
    * Spark UTF8String order). */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Compare two canonical strings in the logical domain of `dt`. */
  def compare(dt: DataType, a: String, b: String): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
         TimestampNTZType | DateType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType =>
      java.lang.Double.compare(a.toDouble, b.toDouble)
    case BooleanType => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case StringType => utf8Compare(a, b)
    case other => throw new IllegalArgumentException(s"no ordering for $other")
  }

  /** Types [[compare]] and the footer collector support. */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
         TimestampNTZType | DateType | FloatType | DoubleType | BooleanType |
         StringType => true
    case _ => false
  }

  // ---- predicate extraction ------------------------------------------------

  /** Split a user filter Column into prunable conjuncts (via
    * [[ColumnBridge.prunableConjuncts]], which walks the `private[sql]`
    * ColumnNode AST and parses `expr("…")` SQL): anything not of the shape
    * `attr op literal` under a top-level AND chain is dropped — never
    * pruned on, still enforced by the exact filter. */
  def conjunctsOf(filter: Column, schema: StructType): Seq[Conjunct] =
    conjunctsFromLeaves(ColumnBridge.prunableConjuncts(filter), schema)

  /** Canonicalize extracted predicate leaves against `schema`. Shared by the
    * Column path above and the SQL entry path (which extracts leaves from an
    * optimized plan's Catalyst filter conditions). */
  def conjunctsFromLeaves(leaves: Seq[ColumnBridge.PredLeaf],
      schema: StructType): Seq[Conjunct] =
    leaves.flatMap { leaf =>
      leaf.op match {
        case "isnull" | "isnotnull" => Some(Conjunct(leaf.field, leaf.op, None))
        case "in" =>
          schema.fields.find(_.name == leaf.field).flatMap { f =>
            val pairs = leaf.value match {
              case s: Seq[_] => s.collect {
                case (v, t: Option[_]) =>
                  (v, t.asInstanceOf[Option[DataType]])
              }
              case _ => Nil
            }
            val canon = pairs.map { case (v, t) =>
              canonicalLiteral(f.dataType, v, t)
            }
            // ONE uncanonicalizable element makes the whole list opaque:
            // pruning on the canonical subset could drop a file whose only
            // match is the opaque element
            if (pairs.nonEmpty && canon.forall(_.isDefined))
              Some(Conjunct(leaf.field, "in", None, canon.flatten.distinct))
            else None
          }
        case op =>
          schema.fields.find(_.name == leaf.field).flatMap(f =>
            canonicalLiteral(f.dataType, leaf.value, leaf.litType).map(cv =>
              Conjunct(leaf.field, op, Some(cv))))
      }
    }

  /** Canonicalize a raw literal value into the COLUMN's domain; None = not
    * coercible (no prune on this conjunct). Values may be Scala-side (the
    * Column DSL) or Catalyst-internal (parsed SQL: UTF8String, Decimal,
    * date days / timestamp micros carried as Int/Long with `litType`
    * declaring which). */
  private[core] def canonicalLiteral(dt: DataType, v: Any,
      litType: Option[DataType]): Option[String] = try {
    val decl = litType.getOrElse(NullType)
    dt match {
      case ByteType | ShortType | IntegerType | LongType => v match {
        // an Int/Long literal is only a plain number when it is not a
        // date/timestamp internal representation
        case _ if decl == DateType || decl == TimestampType ||
          decl == TimestampNTZType => None
        case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
                  _: java.lang.Long) =>
          Some(n.asInstanceOf[java.lang.Number].longValue.toString)
        case d: org.apache.spark.sql.types.Decimal =>
          val bd = d.toBigDecimal
          if (bd.isWhole) Some(bd.toLongExact.toString) else None
        case _ => None
      }
      case FloatType | DoubleType => v match {
        case _ if decl == DateType || decl == TimestampType ||
          decl == TimestampNTZType => None
        case d: org.apache.spark.sql.types.Decimal => Some(normFp(d.toDouble))
        case n: java.lang.Number => Some(normFp(n.doubleValue))
        case _ => None
      }
      case StringType => v match {
        case s: String => Some(s)
        case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
        case _ => None
      }
      case BooleanType => v match {
        case b: java.lang.Boolean => Some(b.toString)
        case _ => None
      }
      case TimestampType | TimestampNTZType => v match {
        case n: java.lang.Long
          if decl == TimestampType || decl == TimestampNTZType =>
          Some(n.toString) // catalyst timestamp literal: already micros
        case t: java.sql.Timestamp =>
          Some((math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L).toString)
        case i: java.time.Instant =>
          Some((math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L).toString)
        // NO bare-string path: Spark casts a string literal to timestamp in
        // the SESSION timezone, so a UTC-parsed prune boundary would diverge
        // from the exact filter in non-UTC sessions and could drop matching
        // files. Typed timestamp'...' literals and java.sql/java.time values
        // are zone-resolved already and stay prunable.
        case _ => None
      }
      case DateType => v match {
        case n: java.lang.Integer if decl == DateType =>
          Some(n.toLong.toString) // catalyst date literal: already days
        case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
        case d: java.time.LocalDate => Some(d.toEpochDay.toString)
        case s: String => Some(java.time.LocalDate.parse(s).toEpochDay.toString)
        case s: org.apache.spark.unsafe.types.UTF8String =>
          Some(java.time.LocalDate.parse(s.toString).toEpochDay.toString)
        case _ => None
      }
      case _ => None
    }
  } catch { case _: Exception => None }

  /** -0.0 and 0.0 are EQUAL in SQL comparisons but Double.compare orders
    * them — normalize so a file whose stats carry -0.0 is never pruned
    * away from a 0.0 predicate (and vice versa). NaN is left as-is:
    * Double.compare places it above everything, which matches Spark's
    * NaN-is-largest comparison semantics. */
  private[core] def normFp(d: Double): String =
    (if (d == 0.0) 0.0 else d).toString

  // ---- file-level evaluation -----------------------------------------------

  /** Partition-directory pruning: can `f`'s `_p_*` dir values satisfy every
    * conjunct on a partition transform's SOURCE column? Works without any
    * footer stats (covers manifests written before bounds collection).
    * Conservative by construction: transforms whose inverse is unsafe never
    * prune — Bucket (would require reimplementing Spark's Murmur3 hash) and
    * time transforms over TIMESTAMP sources (year()/date_format() use the
    * session timezone at write time, so a read-time recomputation can
    * disagree); DATE sources are timezone-free and do prune. */
  def keepFileByPartitions(f: FileEntry, conjs: Seq[Conjunct],
      transforms: Seq[PartitionTransform], schema: StructType,
      fileSchemaOf: Int => Option[StructType] = _ => None): Boolean = {
    if (transforms.isEmpty || conjs.isEmpty) return true
    val dirs = IceTable.partitionValuesOf(f.path)
    // the WRITE-era type of a conjunct's source column: the file's dir
    // values were computed by transforming/hashing under THAT type. A
    // type-changing evolution (e.g. int → long on a bucket source) makes
    // the read-time recomputation disagree — Murmur3 is type-sensitive
    // (hash(1: int) != hash(1L)) — so such files are never dir-pruned,
    // same era rule as [[keepFile]]'s bounds.
    def writeTypeOf(field: String): Option[DataType] = for {
      fld <- schema.fields.find(_.name == field)
      fid <- TableMeta.fieldId(fld)
      fs <- fileSchemaOf(f.schemaId)
      wf <- fs.fields.find(x => TableMeta.fieldId(x).contains(fid))
    } yield wf.dataType
    conjs.forall { c =>
      transforms.filter(_.source == c.field).forall { t =>
        dirs.get(t.name).forall { raw =>
          val curType = schema.fields.find(_.name == c.field).map(_.dataType)
          val eraDiffers = (writeTypeOf(c.field), curType) match {
            case (Some(wt), Some(ct)) =>
              !IceTable.sameTypeIgnoringNullability(wt, ct)
            case _ => false
          }
          eraDiffers || partitionCompatible(t, raw, c, schema)
        }
      }
    }
  }

  private val NullDir = "__HIVE_DEFAULT_PARTITION__"

  private def partitionCompatible(t: PartitionTransform, raw: String,
      c: Conjunct, schema: StructType): Boolean = {
    // Bucket prunes ONLY on equality ("=" / "in" — the delete-one-key /
    // point-lookup shape): the bucket of the literal is computed with
    // SPARK'S OWN Murmur3Hash expression evaluated driver-side (never a
    // reimplementation), and a row matching the equality must sit in that
    // bucket's dir. Rows with a NULL key cannot match an equality, so a
    // pruned file's null-keyed rows are irrelevant. Everything else —
    // range ops (hash is not monotone) and null checks (hash(null) is
    // NON-null: null-keyed rows land in a regular numeric bucket dir,
    // never the default dir) — keeps the file.
    t match {
      case b: PartitionTransform.Bucket =>
        return bucketCompatible(b, raw, c, schema)
      case _ => ()
    }
    val srcType = schema.fields.find(_.name == c.field).map(_.dataType)
    // Spark writes BOTH null and "" partition values as the default dir
    // (ExternalCatalogUtils escapes empty to __HIVE_DEFAULT_PARTITION__),
    // so for string-typed sources the default dir's contents are UNKNOWN —
    // it may hold real empty-string rows. Never prune it.
    val isNullDir = raw == NullDir
    if (isNullDir && srcType.contains(StringType)) return true
    c.op match {
      case "isnull" => isNullDir
      case "isnotnull" => !isNullDir
      case "in" =>
        if (isNullDir) false
        else srcType match {
          case None => true
          case Some(dt) =>
            // keep the file if ANY element lands in this dir — an
            // un-prunable (transform, type) pair keeps it too
            c.values.exists(v =>
              transformedCompare(t, dt, raw, v).forall(_ == 0))
        }
      case op =>
        if (isNullDir) false
        else srcType match {
          case None => true
          case Some(dt) =>
            transformedCompare(t, dt, raw, c.value.get) match {
              case None => true // unsupported combination: never prune
              case Some(cmp) => op match {
                case "=" => cmp == 0
                // monotone non-decreasing transforms: src > L implies
                // T(src) >= T(L), so both strict and non-strict ops prune
                // with the non-strict dir comparison
                case ">" | ">=" => cmp >= 0
                case "<" | "<=" => cmp <= 0
                case _ => true
              }
            }
        }
    }
  }

  /** Bucket-dir equality pruning: keep `raw` iff SOME equality literal's
    * bucket — `pmod(Murmur3Hash(literal, seed 42), n)`, the exact write
    * expression — equals the dir value. Any untyped/unsupported literal,
    * unparseable dir, or non-equality op keeps the file. */
  private def bucketCompatible(b: PartitionTransform.Bucket, raw: String,
      c: Conjunct, schema: StructType): Boolean = {
    if (c.op != "=" && c.op != "in") return true
    val dt = schema.fields.find(_.name == c.field).map(_.dataType)
      .getOrElse(return true)
    val dir = raw.toIntOption.getOrElse(return true)
    // typed catalyst literal in the SOURCE column's type — the hash is
    // type-sensitive (hash(1: int) != hash(1L)), so the type must match
    // what the write's hash(col) saw
    def typed(canonical: String): Option[org.apache.spark.sql.catalyst.expressions.Literal] =
      try {
        import org.apache.spark.sql.catalyst.expressions.Literal
        dt match {
          case ByteType => Some(Literal(canonical.toLong.toByte, ByteType))
          case ShortType => Some(Literal(canonical.toLong.toShort, ShortType))
          case IntegerType => Some(Literal(canonical.toLong.toInt, IntegerType))
          case LongType => Some(Literal(canonical.toLong, LongType))
          case StringType => Some(Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(canonical),
            StringType))
          case DateType => Some(Literal(canonical.toLong.toInt, DateType))
          case _ => None // float/double/decimal/timestamp: never prune
        }
      } catch { case _: Exception => None }
    def bucketOf(canonical: String): Option[Int] = typed(canonical).map { l =>
      val h = org.apache.spark.sql.catalyst.expressions
        .Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
      ((h % b.n) + b.n) % b.n
    }
    val vals = if (c.op == "in") c.values else c.value.toSeq
    if (vals.isEmpty) return true
    // keep if ANY literal's bucket matches — or if any literal is
    // un-bucketable (None ⇒ unknown ⇒ keep)
    vals.exists(v => bucketOf(v).forall(_ == dir))
  }

  /** compare(dirValue, T(literal)) in the transform's output domain, or
    * None when this (transform, source type) pair cannot safely prune.
    * `canonical` is the literal in the SOURCE column's canonical form. */
  private def transformedCompare(t: PartitionTransform, dt: DataType,
      raw: String, canonical: String): Option[Int] = try {
    def isoDate(days: Long): java.time.LocalDate =
      java.time.LocalDate.ofEpochDay(days)
    t match {
      case PartitionTransform.Identity(_) => dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(java.lang.Long.compare(raw.toLong, canonical.toLong))
        case StringType => Some(utf8Compare(raw, canonical))
        case BooleanType =>
          Some(java.lang.Boolean.compare(raw.toBoolean, canonical.toBoolean))
        case DateType => Some(java.lang.Long.compare(
          java.time.LocalDate.parse(raw).toEpochDay, canonical.toLong))
        case _ => None
      }
      case PartitionTransform.Year(_) if dt == DateType =>
        Some(java.lang.Long.compare(raw.toLong,
          isoDate(canonical.toLong).getYear.toLong))
      case PartitionTransform.Month(_) if dt == DateType =>
        val d = isoDate(canonical.toLong)
        Some(utf8Compare(raw, f"${d.getYear}%04d-${d.getMonthValue}%02d"))
      case PartitionTransform.Day(_) if dt == DateType =>
        Some(utf8Compare(raw, isoDate(canonical.toLong).toString))
      case PartitionTransform.Hour(_) if dt == DateType =>
        // date_format(date, "yyyy-MM-dd-HH") pins HH to 00 for dates
        Some(utf8Compare(raw, isoDate(canonical.toLong).toString + "-00"))
      case PartitionTransform.Truncate(n, _) => dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          val l = canonical.toLong
          Some(java.lang.Long.compare(raw.toLong, l - (((l % n) + n) % n)))
        case StringType =>
          // CODE-POINT prefix, matching Spark's substring(): a UTF-16-unit
          // substring could split a surrogate pair, and the lone surrogate
          // encodes as '?' in UTF-8 — a different truncation than the dir
          // value, which would wrongly prune matching files
          val cps = canonical.codePoints().limit(n.toLong).toArray
          Some(utf8Compare(raw, new String(cps, 0, cps.length)))
        case _ => None
      }
      case _ => None // Bucket; time transforms over timestamp sources
    }
  } catch { case _: Exception => None }

  /** Can `f` possibly contain a row matching every conjunct? Unknown bounds
    * (absent entry, absent min/max) keep the file. `schema` is the CURRENT
    * table schema — the conjunct's field name resolves to a field-id, which
    * is how bounds survive renames. `fileSchemaOf` resolves a schemaId to
    * the schema the file was WRITTEN under, so a type-changing evolution
    * disables pruning for pre-change files instead of comparing bounds in
    * the wrong domain. */
  def keepFile(f: FileEntry, conjs: Seq[Conjunct], schema: StructType,
      fileSchemaOf: Int => Option[StructType] = _ => None): Boolean =
    conjs.forall { c =>
      val field = schema.fields.find(_.name == c.field)
      field match {
        case None => true
        case Some(fld) if !supported(fld.dataType) => true
        case Some(fld) =>
          val id = TableMeta.fieldId(fld)
          // bounds were canonicalized under the WRITE-time type; a
          // type-changing schema evolution (readSnapshot casts old files)
          // makes the stored domain differ from the current one — such
          // files are never pruned
          val writeType = for {
            fid <- id
            fs <- fileSchemaOf(f.schemaId)
            wf <- fs.fields.find(x => TableMeta.fieldId(x).contains(fid))
          } yield wf.dataType
          if (writeType.exists(wt =>
              !IceTable.sameTypeIgnoringNullability(wt, fld.dataType))) true
          else try {
            val b = id.flatMap(i => f.bounds.get(i.toString))
              .getOrElse(ColBounds())
            c.op match {
              case "isnull" => b.nulls.forall(_ > 0)
              case "isnotnull" => !b.nulls.contains(f.rows) || f.rows == 0
              case "in" =>
                // a file of only nulls can't match; otherwise keep when
                // ANY element falls inside the bounds
                if (b.nulls.contains(f.rows) && f.rows > 0) false
                else (b.min, b.max) match {
                  case (Some(mn), Some(mx)) => c.values.exists(v =>
                    compare(fld.dataType, mn, v) <= 0 &&
                      compare(fld.dataType, mx, v) >= 0)
                  case _ => true
                }
              case cmpOp =>
                val v = c.value.get
                // a file of only nulls can't match any comparison
                if (b.nulls.contains(f.rows) && f.rows > 0) false
                else (b.min, b.max) match {
                  case (Some(mn), Some(mx)) => cmpOp match {
                    case "=" => compare(fld.dataType, mn, v) <= 0 &&
                      compare(fld.dataType, mx, v) >= 0
                    case "<" => compare(fld.dataType, mn, v) < 0
                    case "<=" => compare(fld.dataType, mn, v) <= 0
                    case ">" => compare(fld.dataType, mx, v) > 0
                    case ">=" => compare(fld.dataType, mx, v) >= 0
                    case _ => true
                  }
                  case _ => true
                }
            }
          // belt for callers without a schema resolver: a cross-domain
          // parse failure (e.g. "apple".toLong after string->long
          // evolution) keeps the file rather than crashing the read
          } catch { case _: Exception => true }
      }
    }
}
