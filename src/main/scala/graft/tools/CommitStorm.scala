package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-process commit exerciser: append `count` single-row commits to an
  * existing table from THIS process. Run several instances concurrently on
  * the same warehouse dir to drive the cross-process optimistic commit
  * protocol ([[graft.core.IceTable]] commitLog/casLog) with real process
  * boundaries — no shared JVM lock, no test hook; every interleaving is
  * the genuine filesystem race. CrossProcessCommitSpec launches two of
  * these and asserts no commit was lost and the snapshot chain is linear
  * and dense.
  *
  * Args: warehouseDir tableIdent startId count [mode]
  * mode `append` (default): `count` single-row appends starting at
  * `startId`; mode `addcols`: `count` addColumn evolutions named
  * `c<startId>_<i>` — drives the metadata CAS instead of the log CAS;
  * mode `mixed`: appends every iteration, MOR-deletes one of its OWN
  * earlier rows every 3rd, compacts every 5th — the conflicting-rewrite
  * aborts (`ConcurrentModificationException`) that deletes/compactions
  * legally take under cross-process racing are caught and recorded, and
  * the process writes `storm-report-<startId>.txt` (lines `A <id>` /
  * `D <id>`) into the warehouse dir so the asserting spec knows exactly
  * which operations LANDED;
  * mode `sqlverbs`: like `mixed` but the mutations are the round-17 SQL
  * STATEMENTS — a subquery `DELETE … WHERE id IN (SELECT …)` (the
  * non-pushable shape that routes through GraftRowLevelStrategy's runtime
  * victim discovery) and a bare `UPDATE` — executed through a registered
  * GraftCatalog, so the strategy layer (plan rebinding, memoized command
  * execution, O(touched) commits) is raced across REAL process
  * boundaries, not just API calls;
  * modes `cloner` / `expirer`: the zero-copy-clone GC contract raced
  * across real processes — the cloner loops create-zero-copy-clone →
  * VALIDATE (clone row count == the pinned source snapshot's liveRows)
  * → discard, while the expirer loops append → expire(retainLast) →
  * destructive orphan GC. A pin that expire or GC failed to honor shows
  * up as a validation mismatch (nonzero exit) — the report records every
  * validated clone (`C <snapId> <rows>`).
  */
object CommitStorm {
  /** Walk an exception's cause chain (self first, bounded) — shared by
    * the per-mode conflict/refusal classifiers. */
  private def causeChain(e: Throwable): Iterator[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)

  def main(args: Array[String]): Unit = {
    val (whDir, table, start, count, mode) = args match {
      case Array(w, t, s, c) => (w, t, s, c, "append")
      case Array(w, t, s, c, m) => (w, t, s, c, m)
      case _ => sys.error("args: warehouseDir table startId count [mode]")
    }
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val cat = graft.core.Catalog.open(spark, whDir)
      val tbl = cat.loadTable(table)
      val s = start.toLong
      mode match {
        case "append" =>
          (0 until count.toInt).foreach { i =>
            tbl.append(Seq((s + i, s"p$s-$i")).toDF("id", "name"))
          }
        case "addcols" =>
          (0 until count.toInt).foreach { i =>
            tbl.addColumn(s"c${s}_$i", "long")
          }
        case "mixed" =>
          import org.apache.spark.sql.functions.col
          val landed = scala.collection.mutable.ListBuffer[String]()
          val appendedIds = scala.collection.mutable.Set[Long]()
          (0 until count.toInt).foreach { i =>
            val id = s + i
            // even an append can abort: after MaxCommitRetries lost CAS
            // windows it throws instead of wedging — a legal (if rare)
            // outcome under adverse contention, so guard it like the
            // rewrites and let the report show what actually landed
            try {
              tbl.append(Seq((id, s"p$s-$i")).toDF("id", "name"))
              landed += s"A $id"
              appendedIds += id
            } catch {
              case _: java.util.ConcurrentModificationException => ()
            }
            if (i % 3 == 2) {
              // delete one of our OWN earlier rows (skipping any whose
              // append aborted): under snapshot isolation a landed own
              // row is always visible to us, so the only legal non-1
              // outcome is a conflicting-rewrite abort
              val victim = s + i / 3
              if (appendedIds.contains(victim)) try {
                val n = tbl.deleteWhereMor(col("id") === victim)
                require(n == 1L, s"delete of own row $victim removed $n rows")
                landed += s"D $victim"
              } catch {
                case _: java.util.ConcurrentModificationException => ()
              }
            }
            if (i % 4 == 3) {
              // atomic MoR update of our own SECOND row; it may also be a
              // delete victim later (i=5), in which case later updates
              // skip — the guard keeps update-after-own-delete impossible
              val target = s + 1
              if (appendedIds.contains(target) &&
                  !landed.contains(s"D $target")) {
                // serializable-level validation aborts an update whenever a
                // FOREIGN update/delete landed since its read — under two
                // racing processes that is common, so retry a few times
                // (each attempt re-reads fresh state) before giving up
                var attempts = 0
                var done = false
                while (!done && attempts < 3) {
                  attempts += 1
                  try {
                    val n = tbl.updateWhereMor(col("id") === target,
                      Map("name" -> org.apache.spark.sql.functions.lit(s"u$s-$i")))
                    if (n == 1L) landed += s"U $target u$s-$i"
                    done = true
                  } catch {
                    case _: java.util.ConcurrentModificationException => ()
                  }
                }
              }
            }
            if (i % 5 == 4)
              try tbl.compact(targetFiles = 2)
              catch { case _: java.util.ConcurrentModificationException => () }
            if (i % 7 == 6) {
              // PARTIAL copy-on-write delete of our own row s+3: carried
              // files move by reference while both processes race. The
              // carried-file list is pinned to the read snapshot
              // (requireParentId), so any interleaved commit aborts it —
              // legal and common under racing; retry with fresh state
              val victim = s + 3
              if (appendedIds.contains(victim) &&
                  !landed.exists(_.startsWith(s"D $victim")) &&
                  !landed.exists(_.startsWith(s"P $victim"))) {
                var attempts = 0
                var done = false
                while (!done && attempts < 4) {
                  attempts += 1
                  try {
                    val (n, snap) = tbl.rewriteWhereCow(col("id") === victim,
                      live => live.where(!(col("id") === victim)))
                    require(n == 1L && snap.isDefined,
                      s"partial CoW delete of own row $victim matched $n")
                    landed += s"P $victim"
                    done = true
                  } catch {
                    case _: java.util.ConcurrentModificationException => ()
                  }
                }
              }
            }
            if (i % 6 == 5) {
              // write-audit-publish leg: stage a single-row batch (its own
              // id space, offset +500), audit it, publish. Publish is an
              // append — it must commute with everything the other process
              // throws at the log; only retry exhaustion may abort it.
              val wid = s + 500 + i
              try {
                tbl.stageAppend(Seq((wid, s"w$s-$i")).toDF("id", "name"),
                  s"wap-$s-$i")
                require(tbl.readWap(s"wap-$s-$i")
                  .where(col("id") === wid).count() == 1L)
                tbl.publishWap(s"wap-$s-$i")
                landed += s"W $wid w$s-$i"
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  // publish lost every CAS retry: discard the stage so no
                  // half-open WAP lingers (the report then omits it)
                  try tbl.discardWap(s"wap-$s-$i")
                  catch { case _: Exception => () }
              }
            }
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(whDir, s"storm-report-$s.txt"),
            landed.mkString("", "\n", "\n"))
        case "cloner" =>
          val landed = scala.collection.mutable.ListBuffer[String]()
          (0 until count.toInt).foreach { i =>
            val cloneName = s"cl_${s}_$i"
            try {
              val dest = cat.cloneTableZeroCopy(table, cloneName)
              val snapId = dest.currentSnapshot.get
                .summary("cloned-snapshot").toLong
              val got = dest.read().count()
              // the pinned snapshot MUST still resolve (tags never
              // expire) and the clone MUST read its exact live rows —
              // any GC/expire that broke the pin surfaces here. A
              // concurrent expire may be BETWEEN its log CAS and its
              // pin-reinstatement pass (the entry is momentarily absent,
              // by design) — retry the lookup briefly before judging.
              var want = tbl.snapshotById(snapId).map(_.liveRows)
              var tries = 0
              while (want.isEmpty && tries < 20) {
                tries += 1; Thread.sleep(100)
                want = tbl.snapshotById(snapId).map(_.liveRows)
              }
              require(want.contains(got),
                s"clone $cloneName diverged: read $got rows, pinned " +
                  s"snapshot $snapId has $want")
              landed += s"C $snapId $got"
              cat.dropTable(cloneName)
              tbl.removeTag(s"clone-default.$cloneName")
            } catch {
              // a clone attempt may lose the tag race to a concurrent
              // expire BEFORE its pin lands (resolve→tag window): that
              // throws cleanly and is legal — only a SILENT divergence
              // (the require above) may fail the process
              case _: java.util.ConcurrentModificationException => ()
              case e: IllegalArgumentException
                  if e.getMessage != null &&
                    (e.getMessage.contains("no snapshot") ||
                      e.getMessage.contains("not in the log")) => ()
            }
            Thread.sleep(30)
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(whDir, s"storm-report-$s.txt"),
            landed.mkString("", "\n", "\n"))
        case "expirer" =>
          import org.apache.spark.sql.functions.col
          val landed = scala.collection.mutable.ListBuffer[String]()
          (0 until count.toInt).foreach { i =>
            val id = s + i
            try {
              tbl.append(Seq((id, s"p$s-$i")).toDF("id", "name"))
              landed += s"A $id"
            } catch {
              case _: java.util.ConcurrentModificationException => ()
            }
            try { tbl.expireSnapshots(retainLast = Some(2)); () }
            catch { case _: java.util.ConcurrentModificationException => () }
            try { tbl.orphanFiles(delete = true); () }
            catch {
              // GC refuses while a foreign tag pin is mid-reinstatement
              // (dangling-tag guard) — legal under racing, retry next loop
              case _: IllegalArgumentException => ()
              case _: IllegalStateException => ()
            }
            if (i % 3 == 2)
              try { tbl.compact(targetFiles = 2); () }
              catch { case _: java.util.ConcurrentModificationException => () }
            Thread.sleep(10)
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(whDir, s"storm-report-$s.txt"),
            landed.mkString("", "\n", "\n"))
        case "sqlverbs" =>
          graft.GraftExtensions.register(spark)
          val catName = s"storm$s"
          spark.conf.set(s"spark.sql.catalog.$catName",
            classOf[graft.engine.GraftCatalog].getName)
          spark.conf.set(s"spark.sql.catalog.$catName.warehouse", whDir)
          val landed = scala.collection.mutable.ListBuffer[String]()
          val appendedIds = scala.collection.mutable.Set[Long]()
          // the SQL path surfaces commit conflicts wrapped by Spark's
          // command execution — walk the cause chain for the engine's
          // ConcurrentModificationException and retry with fresh state
          def isConflict(e: Throwable): Boolean = causeChain(e)
            .exists(_.isInstanceOf[java.util.ConcurrentModificationException])
          def retrying(attempts: Int)(f: => Unit): Boolean = {
            var a = 0
            while (a < attempts) {
              a += 1
              try { f; return true }
              catch { case e: Throwable if isConflict(e) => () }
            }
            false
          }
          (0 until count.toInt).foreach { i =>
            val id = s + i
            try {
              tbl.append(Seq((id, s"p$s-$i")).toDF("id", "name"))
              landed += s"A $id"
              appendedIds += id
            } catch {
              case _: java.util.ConcurrentModificationException => ()
            }
            if (i % 3 == 2) {
              // subquery DELETE of our OWN earlier row: the IN-subquery is
              // exactly the non-pushable shape that needs runtime victim
              // discovery (static pruning sees nothing through the plan)
              val victim = s + i / 3
              if (appendedIds.contains(victim) &&
                  !landed.contains(s"D $victim")) {
                Seq(victim).toDF("vid")
                  .createOrReplaceTempView("storm_victims")
                if (retrying(4)(spark.sql(
                    s"DELETE FROM $catName.default.$table WHERE id IN " +
                      "(SELECT vid FROM storm_victims)")))
                  landed += s"D $victim"
              }
            }
            if (i % 4 == 3) {
              // bare SQL UPDATE of our own second row (skip if deleted) —
              // under racing a foreign commit aborts it, retry fresh
              val target = s + 1
              if (appendedIds.contains(target) &&
                  !landed.contains(s"D $target"))
                if (retrying(4)(spark.sql(
                    s"UPDATE $catName.default.$table SET name = 'u$s-$i' " +
                      s"WHERE id = $target")))
                  landed += s"U $target u$s-$i"
            }
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(whDir, s"storm-report-$s.txt"),
            landed.mkString("", "\n", "\n"))
        case "producer" =>
          // the writer side of the exactly-once-consumer leg. Phase A:
          // appends + MoR deletes with AGGRESSIVE expiry (retainLast=4),
          // so by the time the consumer takes its first step the history
          // tail is gone and its from-zero replay MUST take the
          // documented re-seed path (deterministic, not timing luck).
          // Phase B: wait for the consumer's first fold (handshake file),
          // then a tail of expiry-free commits the consumer must consume
          // INCREMENTALLY.
          import org.apache.spark.sql.functions.col
          val live = scala.collection.mutable.Set[Long]()
          def appendOne(i: Int): Unit = {
            val id = s + i
            try {
              tbl.append(Seq((id, s"p$s-$i")).toDF("id", "name"))
              live += id
            } catch { case _: java.util.ConcurrentModificationException => () }
          }
          (0 until count.toInt).foreach { i =>
            appendOne(i)
            if (i % 4 == 3 && live.nonEmpty) {
              val victim = live.min
              try {
                tbl.deleteWhereMor(col("id") === victim)
                live -= victim
              } catch { case _: java.util.ConcurrentModificationException => () }
            }
            if (i % 3 == 2)
              try { tbl.expireSnapshots(retainLast = Some(4)); () }
              catch { case _: java.util.ConcurrentModificationException => () }
            Thread.sleep(5)
          }
          val alive = java.nio.file.Paths.get(whDir, "consumer-alive.txt")
          val waitUntil = System.currentTimeMillis() + 150000
          while (!java.nio.file.Files.exists(alive) &&
            System.currentTimeMillis() < waitUntil) Thread.sleep(50)
          require(java.nio.file.Files.exists(alive),
            "consumer never reported its first fold")
          (count.toInt until count.toInt + 10).foreach { i =>
            appendOne(i); Thread.sleep(30)
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(whDir, "producer-done.txt"), "done\n")
        case "consumer" =>
          // exactly-once consumer raced against the producer JVM — runs
          // the PRODUCT runner (ChangelogStream: durable offset file,
          // sink-before-offset ordering), not a test replica. Waits until
          // expiry has bitten (minimum retained id > 1) so the first
          // from-zero replay deterministically refuses; only the
          // documented expiry refusal triggers reseed() — any other
          // exception propagates and fails the process, so a broken
          // replay path can never hide behind self-healing re-seeds.
          import org.apache.spark.sql.functions.col
          val lh = graft.Lakehouse.open(spark, whDir)
          val cs = new graft.streaming.ChangelogStream(lh, table,
            java.nio.file.Paths.get(whDir, "consumer-ck"))
          var state = Map.empty[Long, String]
          val fold: (org.apache.spark.sql.DataFrame, Long) => Unit =
            (df, _) => df.select(col("id"), col("name"),
                col(graft.streaming.Changelog.ChangeTypeCol))
              .collect().foreach { r =>
                r.getString(2) match {
                  case "insert" | "update_after" =>
                    state += r.getLong(0) -> r.getString(1)
                  case _ => state -= r.getLong(0) // delete/update_before
                }
              }
          val replaceAll: (org.apache.spark.sql.DataFrame, Long) => Unit =
            (df, _) => state = df.select(col("id"), col("name")).collect()
              .map(r => r.getLong(0) -> r.getString(1)).toMap
          def expiredRefusal(e: Throwable): Boolean =
            causeChain(e).exists(c =>
              (c.isInstanceOf[IllegalArgumentException] ||
                c.isInstanceOf[java.util.ConcurrentModificationException]) &&
              c.getMessage != null && c.getMessage.contains("expired"))
          // deterministic re-seed: start only once the history tail is gone
          var lastProgress = System.currentTimeMillis()
          def progressDeadlineHit = System.currentTimeMillis() - lastProgress > 150000
          var expiryBit = tbl.rawLog.headOption.exists(_.id > 1)
          while (!expiryBit && !progressDeadlineHit) {
            Thread.sleep(50)
            expiryBit = tbl.rawLog.headOption.exists(_.id > 1)
          }
          require(expiryBit, "expiry never bit — no tail pruning seen")
          // the wait consumed budget the first cold Spark batch needs —
          // a slow producer startup must not starve the consume loop
          lastProgress = System.currentTimeMillis()
          var reseeds = 0
          var batches = 0
          val alive = java.nio.file.Paths.get(whDir, "consumer-alive.txt")
          def producerDone = java.nio.file.Files.exists(
            java.nio.file.Paths.get(whDir, "producer-done.txt"))
          var finished = false
          while (!finished) {
            require(!progressDeadlineHit,
              s"consumer stalled (reseeds=$reseeds batches=$batches)")
            val advanced =
              try cs.processAvailable(fold).isDefined
              catch {
                case e: Exception if expiredRefusal(e) =>
                  // the re-seed itself can race the producer's expiry
                  // (its snapshot pinned, but transient read/plan
                  // failures are possible under churn) — bounded retry,
                  // each attempt against fresh state
                  var ok = false
                  var tries = 0
                  while (!ok && tries < 50) {
                    tries += 1
                    try { cs.reseed(replaceAll); ok = true }
                    catch { case _: Exception => Thread.sleep(50) }
                  }
                  require(ok, "re-seed never succeeded")
                  reseeds += 1
                  true
              }
            if (advanced) {
              if (!java.nio.file.Files.exists(alive))
                java.nio.file.Files.writeString(alive, "alive\n")
              batches += 1
              lastProgress = System.currentTimeMillis()
            } else if (producerDone &&
                tbl.rawLog.lastOption.map(_.id) == cs.lastProcessed) {
              finished = true
            } else Thread.sleep(40)
          }
          // batches counted ANY advance; report incremental ones separately
          val lines = (s"meta reseeds=$reseeds batches=${batches - reseeds}" +:
            state.toSeq.sorted.map { case (k, v) => s"$k\t$v" })
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(whDir, "consumer-state.txt"),
            lines.mkString("", "\n", "\n"))
        case other => sys.error(s"unknown mode: $other")
      }
    } finally spark.stop()
  }
}
