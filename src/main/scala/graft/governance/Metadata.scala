package graft.governance

import java.nio.file.Files

import graft.Lakehouse
import graft.core.Jsons

/** Tags (normalized lowercase), table descriptions, bookmarks + search
  * across name/tag/description (reference tagging.py:40-254). */
class Tagging(lh: Lakehouse) {
  import Tagging.Store
  private def path = lh.metaDir.resolve("tagging.json")

  private def load(): Store =
    if (Files.exists(path)) Jsons.readFile[Store](path) else Store()

  private def norm(t: String) = t.trim.toLowerCase

  def addTag(table: String, tag: String): Unit = synchronized {
    val s = load()
    val ts = (s.tags.getOrElse(table, Nil) :+ norm(tag)).distinct
    Jsons.writeFile(path, s.copy(tags = s.tags + (table -> ts)))
  }

  def removeTag(table: String, tag: String): Unit = synchronized {
    val s = load()
    Jsons.writeFile(path, s.copy(tags =
      s.tags + (table -> s.tags.getOrElse(table, Nil).filterNot(_ == norm(tag)))))
  }

  def tags(table: String): List[String] = load().tags.getOrElse(table, Nil)

  def setDescription(table: String, d: String): Unit = synchronized {
    val s = load(); Jsons.writeFile(path, s.copy(descriptions = s.descriptions + (table -> d)))
  }

  def description(table: String): Option[String] = load().descriptions.get(table)

  def bookmark(table: String): Unit = synchronized {
    val s = load(); Jsons.writeFile(path, s.copy(bookmarks = (s.bookmarks :+ table).distinct))
  }

  def unbookmark(table: String): Unit = synchronized {
    val s = load(); Jsons.writeFile(path, s.copy(bookmarks = s.bookmarks.filterNot(_ == table)))
  }

  def bookmarks(): List[String] = load().bookmarks

  /** Follow a [[graft.core.Catalog.renameTable]]: tags, description and
    * bookmark entries re-key under the new ident. */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.{canonicalIdent, rekeyStore}
      val f = canonicalIdent(from)
      val t = canonicalIdent(to)
      val s = load()
      Jsons.writeFile(path, s.copy(
        tags = rekeyStore(s.tags, from, to)(identity),
        descriptions = rekeyStore(s.descriptions, from, to)(identity),
        bookmarks = s.bookmarks
          .map(b => if (canonicalIdent(b) == f) t else b).distinct))
    }

  /** Search across table names, tags, descriptions + catalog names. */
  def search(q: String): List[String] = {
    val s = load()
    val needle = norm(q)
    val catalogHits = lh.catalog.listTables("*").filter(_.toLowerCase.contains(needle))
    val tagHits = s.tags.collect { case (t, ts) if ts.exists(_.contains(needle)) => t }
    val descHits = s.descriptions.collect {
      case (t, d) if d.toLowerCase.contains(needle) => t }
    (catalogHits ++ tagHits ++ descHits).distinct.sorted
  }
}

object Tagging {
  case class Store(tags: Map[String, List[String]] = Map.empty,
      descriptions: Map[String, String] = Map.empty,
      bookmarks: List[String] = Nil)
}

case class GlossaryTerm(term: String, definition: String, aliases: List[String] = Nil)

/** Column descriptions, data classifications, business glossary
  * (reference catalog_metadata.py:42-269). */
class CatalogMetadata(lh: Lakehouse) {
  import CatalogMetadata.Store
  val Classifications = Set("pii", "financial", "public", "internal", "confidential")
  private def path = lh.metaDir.resolve("catalog_metadata.json")

  private def load(): Store =
    if (Files.exists(path)) Jsons.readFile[Store](path) else Store()

  def setColumnDescription(table: String, column: String, desc: String): Unit =
    synchronized {
      val s = load()
      val cols = s.columnDescriptions.getOrElse(table, Map.empty) + (column -> desc)
      Jsons.writeFile(path, s.copy(columnDescriptions = s.columnDescriptions + (table -> cols)))
    }

  def columnDescriptions(table: String): Map[String, String] =
    load().columnDescriptions.getOrElse(table, Map.empty)

  def classify(table: String, column: String, cls: String): Unit = synchronized {
    require(Classifications(cls), s"unknown classification: $cls")
    val s = load()
    val cols = s.classifications.getOrElse(table, Map.empty) + (column -> cls)
    Jsons.writeFile(path, s.copy(classifications = s.classifications + (table -> cols)))
  }

  def classifications(table: String): Map[String, String] =
    load().classifications.getOrElse(table, Map.empty)

  def addGlossaryTerm(t: GlossaryTerm): Unit = synchronized {
    val s = load()
    Jsons.writeFile(path, s.copy(glossary = s.glossary + (t.term.toLowerCase -> t)))
  }

  def removeGlossaryTerm(term: String): Boolean = synchronized {
    val s = load()
    val k = term.toLowerCase
    if (!s.glossary.contains(k)) false
    else { Jsons.writeFile(path, s.copy(glossary = s.glossary - k)); true }
  }

  def glossarySearch(q: String): List[GlossaryTerm] = {
    val needle = q.toLowerCase
    load().glossary.values.filter(t =>
      t.term.toLowerCase.contains(needle) ||
        t.definition.toLowerCase.contains(needle) ||
        t.aliases.exists(_.toLowerCase.contains(needle))).toList.sortBy(_.term)
  }

  /** Follow a [[graft.core.Catalog.renameTable]]: column descriptions and
    * classifications re-key (the glossary is table-independent). */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.rekeyStore
      val s = load()
      Jsons.writeFile(path, s.copy(
        columnDescriptions =
          rekeyStore(s.columnDescriptions, from, to)(identity),
        classifications = rekeyStore(s.classifications, from, to)(identity)))
    }

  /** Enriched schema: column → (type, description, classification, glossary
    * terms substring-matched on the column name, catalog_metadata.py:243-250). */
  def enrichedSchema(table: String): List[Map[String, String]] = {
    val schema = lh.catalog.loadTable(table).schema
    val descs = columnDescriptions(table)
    val cls = classifications(table)
    val glossary = load().glossary.values.toList
    schema.fields.toList.map { f =>
      val terms = glossary.filter(t =>
        f.name.toLowerCase.contains(t.term.toLowerCase) ||
          t.aliases.exists(a => f.name.toLowerCase.contains(a.toLowerCase)))
      Map(
        "name" -> f.name,
        "type" -> f.dataType.typeName,
        "description" -> descs.getOrElse(f.name, ""),
        "classification" -> cls.getOrElse(f.name, ""),
        "glossary_terms" -> terms.map(_.term).mkString(","))
    }
  }
}

object CatalogMetadata {
  case class Store(
      columnDescriptions: Map[String, Map[String, String]] = Map.empty,
      classifications: Map[String, Map[String, String]] = Map.empty,
      glossary: Map[String, GlossaryTerm] = Map.empty)
}

case class NotificationHandler(table: String, event: String, // write|schema_change|sla_violation|maintenance|contract_violation|all
    kind: String, // log | shell | webhook
    target: String)

case class NotificationRecord(table: String, event: String, message: String,
    handler: String, timestampMs: Long)

/** Event notifications (reference notifications.py:39-263): handlers per
  * table × event; history capped at 200. `webhook` is recorded but not sent
  * in this zero-egress build (documented divergence); `shell` runs via
  * ProcessBuilder; `log` appends to the notification history only. */
class Notifications(lh: Lakehouse) {
  val Events = Set("write", "schema_change", "sla_violation", "maintenance",
    "contract_violation", "all")
  val MaxHistory = 200
  private def path = lh.metaDir.resolve("notifications.json")
  private def histPath = lh.metaDir.resolve("notifications_history.json")

  private def load(): List[NotificationHandler] =
    if (Files.exists(path)) Jsons.readFile[List[NotificationHandler]](path) else Nil

  def addHandler(h: NotificationHandler): Unit = synchronized {
    require(Events(h.event), s"unknown event: ${h.event}")
    require(Set("log", "shell", "webhook")(h.kind), s"unknown handler kind: ${h.kind}")
    Jsons.writeFile(path, load() :+ h)
  }

  def handlers(table: String): List[NotificationHandler] =
    load().filter(h => h.table == table || h.table == "*")

  def allHandlers(): List[NotificationHandler] = load()

  /** Stable handler id (reference notifications.py handler_id): content
    * hash of the handler fields, so ids survive restarts. */
  def handlerId(h: NotificationHandler): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${h.table}|${h.event}|${h.kind}|${h.target}".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString

  def removeHandler(id: String): Boolean = synchronized {
    val (matched, kept) = load().partition(h => handlerId(h) == id)
    if (matched.nonEmpty) Jsons.writeFile(path, kept)
    matched.nonEmpty
  }

  /** Follow a [[graft.core.Catalog.renameTable]] (handlers only — the
    * notification HISTORY is a historical record and keeps old names). */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.canonicalIdent
      val f = canonicalIdent(from)
      val t = canonicalIdent(to)
      Jsons.writeFile(path, load().map(h =>
        if (h.table != "*" && canonicalIdent(h.table) == f)
          h.copy(table = t) else h))
    }

  /** Fire an event; called from e.g. the contract monitor
    * (contracts.py:726-734). Best-effort per handler. */
  def fireEvent(table: String, event: String, message: String): List[NotificationRecord] = {
    val matching = handlers(table).filter(h => h.event == event || h.event == "all")
    val records = matching.map { h =>
      try {
        h.kind match {
          case "log" => () // recorded below
          case "shell" =>
            new ProcessBuilder("sh", "-c", h.target)
              .redirectErrorStream(true).start().waitFor()
          case "webhook" => () // zero-egress build: recorded, not sent
        }
      } catch { case _: Exception => () }
      NotificationRecord(table, event, message, s"${h.kind}:${h.target}",
        System.currentTimeMillis())
    }
    if (records.nonEmpty) synchronized {
      Jsons.writeFile(histPath, (history() ++ records).takeRight(MaxHistory))
    }
    records
  }

  def history(): List[NotificationRecord] =
    if (Files.exists(histPath)) Jsons.readFile[List[NotificationRecord]](histPath)
    else Nil
}

case class CloneRecord(original: String, cloneName: String, asOf: Option[String],
    createdMs: Long, zeroCopy: Boolean = false,
    // the source snapshot the clone FORKED from — lets promote detect
    // source commits that landed after the fork (None on records written
    // before fork tracking, or when cloning an empty source)
    forkSnapshotId: Option[Long] = None)

/** Table cloning (reference cloning.py:35-218). The reference copies data
  * despite its zero-copy docstring (cloning.py:89-100); the DEFAULT here
  * keeps copy semantics for reference parity and hard isolation, while
  * `zeroCopy = true` delivers what that docstring promises: an O(metadata)
  * clone whose first snapshot references the source's files by path,
  * GC-safe via a pin tag on the source (the full contract is documented
  * on [[graft.core.Catalog.cloneTableZeroCopy]]); [[discard]] releases
  * the pin. */
class Cloning(lh: Lakehouse) {
  private def path = lh.metaDir.resolve("clones.json")

  private def load(): List[CloneRecord] =
    if (Files.exists(path)) Jsons.readFile[List[CloneRecord]](path) else Nil

  def clone(original: String, cloneName: String, asOf: Option[String] = None,
      zeroCopy: Boolean = false): CloneRecord = {
    // fork point = the exact snapshot the clone's CONTENT came from —
    // promote's conflict detection compares the source head against it.
    // Derived race-free: from the pin tag for zero-copy (the pinned
    // snapshot IS the cloned one), from a pre-resolved snapshot for copy
    // (read that snapshot, not whatever head the read lands on).
    val fork: Option[Long] =
      if (zeroCopy) {
        lh.catalog.cloneTableZeroCopy(original, cloneName, asOf)
        val (ns, t) = graft.core.Catalog.parseIdent(cloneName)
        lh.catalog.loadTable(original).tags.get(s"clone-$ns.$t")
      } else {
        val src = lh.catalog.loadTable(original)
        val snap = asOf.map(src.resolveRef).orElse(src.currentSnapshot)
        val df = snap.map(s => src.readAsOf(s.id.toString)).getOrElse(src.read())
        // a COPY clone owns its data outright — it must not inherit a
        // zero-copy source's reverse pointer (it pins nothing) NOR the
        // source's ref.tag.* properties: tag ids resolve against the
        // SOURCE's snapshot log (wrong or nonexistent here), and an
        // inherited clone-* pin tag would falsely block dropTable and
        // pin this clone's own same-id snapshot forever (the zero-copy
        // path filters identically — Catalog.cloneTableZeroCopy)
        val tbl = lh.catalog.createTable(cloneName, src.schema,
          src.meta.partitionSpec,
          (src.meta.properties - graft.core.Catalog.ClonedFromKey)
            .filterNot(_._1.startsWith("ref.tag.")))
        tbl.append(df)
        // an EMPTY source forks at head id 0 (the commit CAS treats an
        // empty log as head 0), so a guarded promote is still expressible
        // — None would make requireSourceUnchanged permanently refuse
        snap.map(_.id).orElse(Some(0L))
      }
    val rec = CloneRecord(original, cloneName, asOf,
      System.currentTimeMillis(), zeroCopy, fork)
    synchronized { Jsons.writeFile(path, load() :+ rec) }
    lh.audit.log(cloneName, "clone", Map("from" -> original,
      "zero_copy" -> zeroCopy.toString))
    rec
  }

  /** Promote: overwrite the original with the clone's current data.
    *
    * `requireSourceUnchanged = true` turns this into a FAST-FORWARD
    * publish: it lands only if the source head is still the clone's fork
    * snapshot — i.e. no source commit would be silently discarded by the
    * overwrite. The check rides [[graft.core.IceTable.overwriteIfHead]]'s
    * per-CAS-attempt validation, so it is race-free against concurrent
    * source writers (a plain head comparison here would be
    * check-then-act). On conflict it throws; re-clone from the new head
    * or promote without the flag to overwrite deliberately (the
    * reference's semantics, and still the default). */
  def promote(cloneName: String, requireSourceUnchanged: Boolean = false): Unit = {
    val rec = load().find(_.cloneName == cloneName)
      .getOrElse(throw new IllegalArgumentException(s"not a clone: $cloneName"))
    val data = lh.catalog.loadTable(cloneName).read()
    val src = lh.catalog.loadTable(rec.original)
    if (requireSourceUnchanged) {
      val fork = rec.forkSnapshotId.getOrElse(
        throw new IllegalArgumentException(
          s"clone $cloneName predates fork tracking — promote without " +
            "requireSourceUnchanged, or re-clone"))
      src.overwriteIfHead(fork, data)
    } else src.overwrite(data)
    lh.audit.log(rec.original, "clone_promote", Map("clone" -> cloneName,
      "fast_forward" -> requireSourceUnchanged.toString))
  }

  def discard(cloneName: String): Unit = synchronized {
    val rec = load().find(_.cloneName == cloneName)
      .getOrElse(throw new IllegalArgumentException(s"not a clone: $cloneName"))
    lh.catalog.dropTable(cloneName)
    // release the zero-copy pin: the source snapshot (and its files)
    // become expirable/collectible again once no clone references them
    if (rec.zeroCopy && lh.catalog.tableExists(rec.original)) {
      val (ns, t) = graft.core.Catalog.parseIdent(cloneName)
      lh.catalog.loadTable(rec.original).removeTag(s"clone-$ns.$t")
    }
    Jsons.writeFile(path, load().filterNot(_.cloneName == cloneName))
  }

  def list(): List[CloneRecord] = load()

  /** Follow a [[graft.core.Catalog.renameTable]]: a renamed CLONE keeps
    * its promotable fork record; a renamed SOURCE keeps its clones
    * promotable back into it under the new name. */
  private[graft] def renameTable(from: String, to: String): Unit =
    synchronized {
      import graft.core.Catalog.canonicalIdent
      val f = canonicalIdent(from)
      val t = canonicalIdent(to)
      Jsons.writeFile(path, load().map { r =>
        val r1 = if (canonicalIdent(r.original) == f) r.copy(original = t)
                 else r
        if (canonicalIdent(r1.cloneName) == f) r1.copy(cloneName = t) else r1
      })
    }
}
