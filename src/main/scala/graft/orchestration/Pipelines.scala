package graft.orchestration

import java.nio.file.Files

import graft.Lakehouse
import graft.core.Jsons

case class PipelineStep(sql: String, targetTable: Option[String] = None,
    mode: String = "overwrite") // overwrite | append

case class Pipeline(name: String, steps: List[PipelineStep],
    description: String = "", lastRunStatus: String = "never_run",
    lastRunMs: Long = 0)

case class StepResult(step: Int, status: String, rows: Long, message: String,
    durationSec: Double)

/** Named multi-step SQL pipelines (reference pipelines.py). Step failure
  * stops the pipeline; audit + lineage recorded per step; dry-run validates
  * by parse+analyze; target schema comes from the result DataFrame's schema
  * (vs the reference's all-string inference, incremental.py:307 — noted
  * improvement). */
class Pipelines(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("pipelines.json")

  private def load(): Map[String, Pipeline] =
    if (Files.exists(path)) Jsons.readFile[Map[String, Pipeline]](path) else Map.empty

  private def save(m: Map[String, Pipeline]): Unit = Jsons.writeFile(path, m)

  def create(name: String, steps: Seq[PipelineStep], description: String = ""): Unit =
    synchronized {
      require(!load().contains(name), s"pipeline exists: $name")
      require(steps.nonEmpty, "pipeline needs at least one step")
      steps.foreach(s => require(Set("overwrite", "append")(s.mode),
        s"bad mode: ${s.mode}"))
      save(load() + (name -> Pipeline(name, steps.toList, description)))
    }

  def get(name: String): Pipeline =
    load().getOrElse(name, throw new IllegalArgumentException(s"no such pipeline: $name"))

  def list(): List[Pipeline] = load().values.toList.sortBy(_.name)

  def drop(name: String): Unit = synchronized {
    require(load().contains(name), s"no such pipeline: $name")
    save(load() - name)
  }

  /** Validate every step without executing (pipelines.py:155-185). Target
    * tables of earlier steps are registered as empty placeholder views with
    * the step's analyzed schema, so later steps referencing them validate. */
  def dryRun(name: String): List[StepResult] = {
    val p = get(name)
    lh.engine.refresh()
    p.steps.zipWithIndex.map { case (s, i) =>
      try {
        val df = lh.spark.sql(lh.engine.rewriteNamespaces(s.sql))
        df.queryExecution.analyzed // force analysis
        s.targetTable.foreach { t =>
          if (!lh.catalog.tableExists(t)) {
            val (_, short) = graft.core.Catalog.parseIdent(t)
            lh.spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              df.schema).createOrReplaceTempView(short)
          }
        }
        StepResult(i, "valid", 0, "", 0)
      } catch {
        case e: Exception => StepResult(i, "invalid", 0, String.valueOf(e.getMessage), 0)
      }
    }
  }

  def run(name: String, incremental: Boolean = false,
      pipelineId: Option[String] = None): List[StepResult] = synchronized {
    val p = get(name)
    val pid = pipelineId.getOrElse(name)
    var failed = false
    val results = p.steps.zipWithIndex.map { case (step, i) =>
      if (failed) StepResult(i, "skipped", 0, "previous step failed", 0)
      else {
        val t0 = System.nanoTime()
        try {
          // incremental mode: re-register each source table as only its
          // new-since-watermark rows (incremental.py:242-361)
          val sources = lh.engine.referencedTables(step.sql)
          val batchSnapshots = scala.collection.mutable.Map.empty[String, Option[Long]]
          if (incremental) sources.foreach { t =>
            val ident = if (t.contains(".")) t else s"default.$t"
            if (lh.catalog.tableExists(ident)) {
              val batch = lh.incremental.getIncrementalData(pid, ident)
              batchSnapshots(ident) = batch.toSnapshot
              val (ns, short) = graft.core.Catalog.parseIdent(ident)
              // register under BOTH names the rewritten SQL may use
              batch.data.createOrReplaceTempView(short)
              batch.data.createOrReplaceTempView(s"${ns}__$short")
            }
          } else lh.engine.refresh()
          val df = lh.spark.sql(lh.engine.rewriteNamespaces(step.sql))
          val rows = step.targetTable match {
            case Some(target) =>
              if (!lh.catalog.tableExists(target))
                lh.catalog.createTable(target, df.schema, Nil,
                  Map("graft.pipeline" -> name))
              val tbl = lh.catalog.loadTable(target)
              val snap = if (step.mode == "append") tbl.append(df) else tbl.overwrite(df)
              lh.lineage.record(sources, target, s"pipeline:$name", step.sql)
              lh.audit.log(target, "pipeline_step",
                Map("pipeline" -> name, "step" -> i.toString))
              snap.summary.getOrElse("added-rows", "0").toLong
            case None => df.count()
          }
          if (incremental) sources.foreach { t =>
            val ident = if (t.contains(".")) t else s"default.$t"
            if (lh.catalog.tableExists(ident))
              // advance to the snapshot the batch actually read, so rows
              // committed since then surface in the NEXT batch
              lh.incremental.advance(pid, ident, rows,
                batchSnapshots.getOrElse(ident, None))
          }
          StepResult(i, "ok", rows, "", (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Exception =>
            failed = true
            StepResult(i, "failed", 0, String.valueOf(e.getMessage),
              (System.nanoTime() - t0) / 1e9)
        }
      }
    }
    val status = if (failed) "failed" else "success"
    save(load() + (name -> p.copy(lastRunStatus = status,
      lastRunMs = System.currentTimeMillis())))
    results
  }
}
