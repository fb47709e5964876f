package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionDirectory, PartitionSpec}
import org.apache.spark.sql.types.StructType

/** File index over ONE IceLite snapshot's data files with MANIFEST-LEVEL
  * file skipping wired into `listFiles`: Spark's DSv2 parquet scan hands
  * the pushed data filters here before planning input partitions, so a
  * selective predicate against a 100 TB table tasks only the files whose
  * column bounds / partition dirs / bloom pages can match — the same
  * three pruning layers as `IceTable.prunedRead`, now under the native
  * `catalog.ns.table` SQL path. Pruning is conservative (three-valued);
  * parquet row-group pushdown still applies inside every kept file, so
  * results are exact.
  *
  * Lives in the `org.apache.spark.sql` namespace because
  * `InMemoryFileIndex`'s Scala signature is `private[sql]` — the standard
  * bridge pattern this repo already uses for ColumnBridge. */
class GraftFileIndex(
    spark: SparkSession,
    files: Seq[Path],
    schema: StructType,
    // path -> keep? given the pruned set; evaluated per listFiles call
    prune: Seq[ColumnBridge.PredLeaf] => Set[String])
  extends InMemoryFileIndex(spark, files, Map.empty[String, String],
    Some(schema), FileStatusCache.getOrCreate(spark),
    Some(PartitionSpec.emptySpec), None) {

  /** Strip scheme + authority slashes — FileStatus renders `file:/p`,
    * manifests store plain `/p`. */
  private def canon(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/*", "/")

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) return base
    val leaves = dataFilters.flatMap(ColumnBridge.catalystConjuncts)
    if (leaves.isEmpty) return base
    // canon BOTH sides: the callback returns manifest renderings, the
    // statuses carry filesystem renderings — a mismatch here would be a
    // FALSE NEGATIVE (file wrongly dropped), the one unacceptable error
    val keep = prune(leaves).map(canon)
    base.map(pd => pd.copy(files =
        pd.files.filter(f => keep(canon(f.getPath.toString)))))
      .filter(_.files.nonEmpty)
  }
}
