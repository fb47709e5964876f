package graft.governance

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lakehouse
import graft.core.Jsons

/** A masking policy: strategy ∈ hash | redact | nullify | truncate |
  * expression (reference masking.py:13). Policy lookup is COLUMN-NAME-GLOBAL
  * across tables (masking.py:167-171) and masking applies post-query to
  * result frames — both quirks preserved for parity. */
case class MaskingPolicy(column: String, strategy: String,
    params: Map[String, String] = Map.empty)

class Masking(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("masking.json")

  private def load(): Map[String, MaskingPolicy] =
    if (Files.exists(path)) Jsons.readFile[Map[String, MaskingPolicy]](path)
    else Map.empty

  def setPolicy(p: MaskingPolicy): Unit = synchronized {
    require(Set("hash", "redact", "nullify", "truncate", "expression")(p.strategy),
      s"unknown strategy: ${p.strategy}")
    Jsons.writeFile(path, load() + (p.column -> p))
  }

  def dropPolicy(column: String): Unit = synchronized {
    require(load().contains(column), s"no policy for column: $column")
    Jsons.writeFile(path, load() - column)
  }

  def policies(): Map[String, MaskingPolicy] = load()

  private def maskColumn(c: Column, dt: org.apache.spark.sql.types.DataType,
      p: MaskingPolicy): Column = p.strategy match {
    case "hash" => sha2(c.cast("string"), 256)
    case "redact" => lit(p.params.getOrElse("replacement", "***REDACTED***"))
    case "nullify" => lit(null).cast(dt)
    case "truncate" =>
      substring(c.cast("string"), 1, p.params.getOrElse("length", "4").toInt)
    case "expression" => expr(p.params("sql"))
  }

  /** Apply every matching policy to a result frame (masking.py:158-196). */
  def apply(df: DataFrame): DataFrame = {
    val ps = load()
    df.schema.fields.foldLeft(df) { (d, f) =>
      ps.get(f.name) match {
        case Some(p) => d.withColumn(f.name, maskColumn(col(f.name), f.dataType, p))
        case None => d
      }
    }
  }

  /** Original-vs-masked preview rows (masking.py:199-246). */
  def preview(df: DataFrame, n: Int = 5): Seq[(org.apache.spark.sql.Row, org.apache.spark.sql.Row)] = {
    val limited = df.limit(n).cache()
    limited.collect().toSeq.zip(apply(limited).collect().toSeq)
  }
}

case class SlaPolicy(table: String,
    maxStalenessHours: Option[Double] = None,
    minQualityScore: Option[Double] = None,
    minRowCount: Option[Long] = None,
    maxNullPct: Option[Double] = None)

case class SlaViolation(table: String, check: String, level: String, // violation|warning
    message: String)

/** SLA thresholds per table; warnings fire at 90% of the limit
  * (reference sla.py:34-293, warn factor sla.py:174-177). History 50. */
class Sla(lh: Lakehouse) {
  val WarnFactor = 0.9
  val MaxHistory = 50
  private def path = lh.metaDir.resolve("sla.json")
  private def histPath = lh.metaDir.resolve("sla_history.json")

  private def load(): Map[String, SlaPolicy] =
    if (Files.exists(path)) Jsons.readFile[Map[String, SlaPolicy]](path) else Map.empty

  def setPolicy(p: SlaPolicy): Unit = synchronized {
    Jsons.writeFile(path, load() + (p.table -> p))
  }

  def policy(table: String): Option[SlaPolicy] = load().get(table)

  def policies(): List[SlaPolicy] = load().values.toList.sortBy(_.table)

  def dropPolicy(table: String): Unit = synchronized {
    Jsons.writeFile(path, load() - table)
  }

  /** Follow a [[graft.core.Catalog.renameTable]]: re-key the policy and
    * the check history under the new ident. */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.{canonicalIdent, rekeyStore}
      val t = canonicalIdent(to)
      Jsons.writeFile(path,
        rekeyStore(load(), from, to)(_.copy(table = t)))
      Jsons.writeFile(histPath, rekeyStore(loadHist(), from, to)(identity))
    }

  def check(table: String): List[SlaViolation] = {
    val p = load().getOrElse(table, return Nil)
    val tbl = lh.catalog.loadTable(table)
    val snap = tbl.currentSnapshot
    var out = List.empty[SlaViolation]

    p.maxStalenessHours.foreach { maxH =>
      val ageH = snap.map(s =>
        (System.currentTimeMillis() - s.timestampMs) / 3600000.0).getOrElse(Double.MaxValue)
      if (ageH > maxH) out :+= SlaViolation(table, "staleness", "violation",
        f"age $ageH%.1fh > $maxH%.1fh")
      else if (ageH > maxH * WarnFactor) out :+= SlaViolation(table, "staleness",
        "warning", f"age $ageH%.1fh approaching $maxH%.1fh")
    }
    p.minRowCount.foreach { minR =>
      val rows = snap.map(_.totalRows).getOrElse(0L)
      if (rows < minR) out :+= SlaViolation(table, "row_count", "violation",
        s"$rows rows < $minR")
      else if (rows < minR / WarnFactor) out :+= SlaViolation(table, "row_count",
        "warning", s"$rows rows approaching $minR")
    }
    p.minQualityScore.foreach { minQ =>
      val q = lh.quality.computeScore(table).score
      if (q < minQ) out :+= SlaViolation(table, "quality", "violation",
        f"score $q%.3f < $minQ%.3f")
      else if (q < minQ / WarnFactor) out :+= SlaViolation(table, "quality",
        "warning", f"score $q%.3f approaching $minQ%.3f")
    }
    p.maxNullPct.foreach { maxN =>
      val stats = lh.profile.computeStats(table)
      val cells = stats.rowCount * math.max(stats.columnNullCounts.size, 1)
      val pct = if (cells == 0) 0.0
        else stats.columnNullCounts.values.sum.toDouble / cells * 100
      if (pct > maxN) out :+= SlaViolation(table, "null_pct", "violation",
        f"$pct%.1f%% nulls > $maxN%.1f%%")
      else if (pct > maxN * WarnFactor) out :+= SlaViolation(table, "null_pct",
        "warning", f"$pct%.1f%% nulls approaching $maxN%.1f%%")
    }
    synchronized {
      val h = history(table) :+ SlaCheckRecord(System.currentTimeMillis(), out.size)
      val all = loadHist() + (table -> h.takeRight(MaxHistory))
      Jsons.writeFile(histPath, all)
    }
    out
  }

  private def loadHist(): Map[String, List[SlaCheckRecord]] =
    if (Files.exists(histPath)) Jsons.readFile[Map[String, List[SlaCheckRecord]]](histPath)
    else Map.empty

  def history(table: String): List[SlaCheckRecord] =
    loadHist().getOrElse(table, Nil)
}

case class SlaCheckRecord(timestampMs: Long, issues: Int)
