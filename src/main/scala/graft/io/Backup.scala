package graft.io

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import graft.Lakehouse
import graft.core.Jsons

case class BackupManifest(table: String, rowCount: Long, schemaJson: String,
    sha256: String, createdMs: Long)

/** Backup/restore (reference backup.py:22-511): table → tar.gz of parquet +
  * metadata.json, with a sha256 checksum over the data payload; restore
  * recreates the table; verify re-hashes. */
class Backup(lh: Lakehouse) {

  private def sha256Of(dir: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val walk = Files.walk(dir)
    val files = (
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .toList
      finally walk.close()
    ).sortBy(_.toString)
    files.foreach(f => md.update(Files.readAllBytes(f)))
    md.digest().map("%02x".format(_)).mkString
  }

  private def run(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"command failed: ${cmd.mkString(" ")}\n$out")
  }

  /** Create `<target>.tar.gz` holding data/ + metadata.json. */
  def backupTable(table: String, targetTarGz: String): BackupManifest = {
    val tbl = lh.catalog.loadTable(table)
    val staging = Files.createTempDirectory("graft-backup-")
    val dataDir = staging.resolve("data")
    // single-snapshot export: write current data as parquet
    tbl.read().write.parquet(dataDir.toString)
    val manifest = BackupManifest(table,
      tbl.currentSnapshot.map(_.totalRows).getOrElse(0L),
      tbl.schema.json, sha256Of(dataDir), System.currentTimeMillis())
    Jsons.writeFile(staging.resolve("metadata.json"), manifest)
    val target = Paths.get(targetTarGz).toAbsolutePath
    Files.createDirectories(target.getParent)
    run("tar", "-czf", target.toString, "-C", staging.toString, ".")
    lh.audit.log(table, "backup", Map("target" -> targetTarGz))
    manifest
  }

  /** Restore into (possibly new) `table`; refuses checksum mismatches. */
  def restoreTable(tarGz: String, table: String, overwrite: Boolean = false): Long = {
    val staging = Files.createTempDirectory("graft-restore-")
    run("tar", "-xzf", Paths.get(tarGz).toAbsolutePath.toString, "-C", staging.toString)
    val manifest = Jsons.readFile[BackupManifest](staging.resolve("metadata.json"))
    val actual = sha256Of(staging.resolve("data"))
    require(actual == manifest.sha256,
      s"backup checksum mismatch: $actual != ${manifest.sha256}")
    val schema = org.apache.spark.sql.types.DataType.fromJson(manifest.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val df = lh.spark.read.schema(schema).parquet(staging.resolve("data").toString)
    val tbl =
      if (lh.catalog.tableExists(table)) {
        require(overwrite, s"table exists: $table (pass overwrite=true)")
        lh.catalog.loadTable(table)
      } else lh.catalog.createTable(table, schema, Nil, Map.empty)
    val snap = tbl.overwrite(df)
    lh.audit.log(table, "restore", Map("source" -> tarGz))
    snap.totalRows
  }

  /** Re-hash the archive's payload against its manifest (backup.py verify). */
  def verifyBackup(tarGz: String): Boolean = {
    val staging = Files.createTempDirectory("graft-verify-")
    run("tar", "-xzf", Paths.get(tarGz).toAbsolutePath.toString, "-C", staging.toString)
    val manifest = Jsons.readFile[BackupManifest](staging.resolve("metadata.json"))
    sha256Of(staging.resolve("data")) == manifest.sha256
  }

  /** Default backup directory, analogue of the reference's backups dir. */
  def backupsDir: Path = lh.metaDir.resolve("backups")

  /** List archives in a backup directory with their manifests, newest first
    * (reference backup.py list_backups reverse sort): (file, manifest,
    * sizeBytes). Unreadable/foreign tarballs are listed with no manifest. */
  def listBackups(dir: Option[String] = None): List[(String, Option[BackupManifest], Long)] = {
    val d = dir.map(Paths.get(_)).getOrElse(backupsDir)
    if (!Files.isDirectory(d)) return Nil
    val listing = Files.list(d)
    val archives =
      try listing.iterator().asScala
        .filter(p => p.toString.endsWith(".tar.gz") || p.toString.endsWith(".tgz"))
        .toList
      finally listing.close()
    archives.sortBy(_.getFileName.toString)(Ordering[String].reverse)
      .map { p =>
        val manifest =
          try {
            // accept any member path ending in metadata.json, like the
            // reference (backup.py:440-442) — archives built without the
            // "./" prefix still list with a manifest. Member names come from
            // the UNTRUSTED archive's own listing: reject names that tar
            // could parse as options ("-...") or that traverse out of the
            // staging dir ("..") before passing one as an argument.
            val member = listMembers(p).find(m =>
              m.endsWith("metadata.json") && !m.startsWith("-") &&
                !m.split('/').contains(".."))
            member.map { m =>
              val staging = Files.createTempDirectory("graft-list-")
              try {
                run("tar", "-xzf", p.toAbsolutePath.toString, "-C",
                  staging.toString, "--", m)
                // locate rather than resolve(m): tar strips leading "/" on
                // extraction, so an absolute member name would resolve
                // OUTSIDE the staging dir and miss the extracted file
                val extracted = {
                  val walk = Files.walk(staging)
                  try walk.iterator().asScala
                    .find(f => Files.isRegularFile(f) &&
                      f.getFileName.toString == "metadata.json")
                    .getOrElse(throw new IllegalStateException(
                      s"member $m extracted but metadata.json not found"))
                  finally walk.close()
                }
                Jsons.readFile[BackupManifest](extracted)
              } finally deleteRecursively(staging)
            }
          } catch { case _: Exception => None }
        (p.getFileName.toString, manifest, Files.size(p))
      }
  }

  private def listMembers(tarGz: Path): List[String] = {
    // stderr stays separate: tar warnings ("Removing leading '/'...")
    // must not be mistaken for member names. It goes to a temp file, not a
    // second pipe — reading stdout to EOF while tar blocks on a full
    // stderr pipe (>~64KB of warnings) would deadlock both processes.
    val errFile = Files.createTempFile("graft-tar-err-", ".log")
    try {
      val p = new ProcessBuilder("tar", "-tzf", tarGz.toAbsolutePath.toString)
        .redirectError(errFile.toFile).start()
      val out = new String(p.getInputStream.readAllBytes())
      require(p.waitFor() == 0,
        s"tar -tzf failed for $tarGz\n${new String(Files.readAllBytes(errFile))}")
      out.linesIterator.toList
    } finally Files.deleteIfExists(errFile)
  }

  private def deleteRecursively(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }
}
