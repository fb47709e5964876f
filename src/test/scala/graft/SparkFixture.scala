package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (JVM-wide singleton). */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // builder-installed so analyzer rules (GraftEngineReadRule) are live
      // in every suite, not just the function/strategy registrations
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  /** Run `f` with the merged-assemble era threshold forced to `n`,
    * ALWAYS restoring the prior value (suites run sequentially in one
    * forked JVM, so a leaked tweak would silently re-route every later
    * suite's reads). With `expectFired` (the default when LOWERING the
    * threshold to force the merged path), asserts the merged path
    * actually fired — a regression that always falls back to per-era
    * must fail here, not pass vacuously; pass false when RAISING the
    * threshold to force the per-era path. */
  def withMergedThreshold[T](n: Int, expectFired: Boolean = true)
      (f: => T): T = {
    val saved = graft.core.IceTable.MergedAssembleMinGroups
    val fired0 = graft.core.IceTable.mergedAssembleCount.get()
    try {
      graft.core.IceTable.MergedAssembleMinGroups = n
      val r = f
      if (expectFired)
        assert(graft.core.IceTable.mergedAssembleCount.get() > fired0,
          "the merged multi-era read never fired under the forced threshold")
      r
    } finally graft.core.IceTable.MergedAssembleMinGroups = saved
  }
}
