package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** JSON (de)serialization + atomic local-file IO for all metadata.
  *
  * The reference keeps every metadata store as a JSON file with a
  * load/save pair per module (e.g. reference validation.py:23-38); we
  * centralize that here with atomic replace semantics (temp + ATOMIC_MOVE)
  * so a crashed writer can never leave a half-written snapshot log.
  */
object Jsons {
  implicit val formats: Formats = DefaultFormats

  def write[A <: AnyRef](a: A): String = Serialization.writePretty(a)

  def read[A <: AnyRef](s: String)(implicit m: Manifest[A]): A =
    Serialization.read[A](s)

  def writeFile[A <: AnyRef](path: Path, a: A): Unit =
    writeString(path, write(a))

  def readFile[A <: AnyRef](path: Path)(implicit m: Manifest[A]): A =
    read[A](readString(path))

  def writeString(path: Path, s: String): Unit = {
    Files.createDirectories(path.getParent)
    // unique temp name per writer: with a FIXED sibling name, two processes
    // (CLI + MCP server) writing the same store concurrently could promote
    // a half-written temp file; unique temps make the final move the only
    // shared step, and that one is atomic. Plain Files.write (not
    // createTempFile) so the file gets umask-default permissions — a 600
    // temp would carry onto the store file and break a second process
    // running as a different user.
    val tmp = path.resolveSibling(
      s".${path.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    try {
      Files.write(tmp, s.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp) // no orphan on a failed write
  }

  def readString(path: Path): String =
    new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
}
