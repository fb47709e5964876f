package graft.core

import java.nio.file.{Path, Paths}

/** The per-snapshot manifest list: which manifest files make up one table
  * version. `dataManifests`/`deleteManifests` are paths to append-only
  * JSON files each holding the `List[FileEntry]` ONE commit added (so an
  * append reuses every parent manifest by reference and writes only its
  * own); `eqDeleteFiles` entries are inline because they are one small
  * record per delete commit (the key VALUES already live in parquet dirs,
  * see [[EqDeleteEntry]]) and are bounded by compaction.
  *
  * This is Iceberg's snapshot → manifest-list → manifest design
  * (the reference gets it from PyIceberg's avro manifest lists for free);
  * JSON instead of avro, same asymptotics: commit cost O(new files) +
  * O(#manifests), never O(all files). */
case class ManifestList(
    dataManifests: List[String],
    deleteManifests: List[String] = Nil,
    eqDeleteFiles: List[EqDeleteEntry] = Nil)

/** Read/write manifest files with a content cache. Manifest files are
  * IMMUTABLE once written (append-only layer), which makes the cache
  * trivially coherent: a path's content never changes, so a hit is always
  * valid. The cache is what keeps [[IceTable.snapshots]] cheap — resolving
  * N snapshots that share manifests parses each manifest file once per
  * JVM, not once per snapshot per call. */
object Manifests {
  private val MaxCachedManifests = 4096
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, List[FileEntry]]()

  def writeManifest(path: Path, files: List[FileEntry]): String = {
    Jsons.writeFile(path, files)
    cache.put(path.toString, files)
    path.toString
  }

  def readManifest(path: String): List[FileEntry] = {
    val hit = cache.get(path)
    if (hit != null) hit
    else {
      val loaded = Jsons.readFile[List[FileEntry]](Paths.get(path))
      // blunt overflow guard: manifest sets big enough to overflow the cap
      // belong to long-gone snapshots; a full clear keeps the map bounded
      // without LRU bookkeeping on the hot read path
      if (cache.size >= MaxCachedManifests) cache.clear()
      cache.put(path, loaded)
      loaded
    }
  }

  /** Drop every cached manifest under `prefix`. Used by
    * [[Catalog.renameTable]], which moves a table dir: the cache's
    * immutability premise ("a path's content never changes") holds for
    * the moved paths only until a table created LATER at the old path
    * writes a same-named manifest there — evicting the stale keys at
    * move time closes that aliasing window. */
  private[core] def invalidatePrefix(prefix: String): Unit = {
    val it = cache.keys()
    while (it.hasMoreElements) {
      val k = it.nextElement()
      if (k.startsWith(prefix)) cache.remove(k)
    }
  }

  def writeList(path: Path, list: ManifestList): String = {
    Jsons.writeFile(path, list)
    path.toString
  }

  def readList(path: String): ManifestList =
    Jsons.readFile[ManifestList](Paths.get(path))
}
