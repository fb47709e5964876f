package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication — the CCNet / RefinedWeb boilerplate
  * pass: a LINE (newline-delimited) whose normalized form occurs in at
  * least `minDocs` DISTINCT documents is boilerplate (navigation, cookie
  * banners, license footers, repeated headers) and is removed from EVERY
  * document; surviving lines are rejoined in original order. This is the
  * line-granular sibling of [[SpanDedup]] (token k-grams) and
  * [[NearDup]]'s document-level passes — real curation pipelines run all
  * three at different granularities.
  *
  * Scale shape (the whole point): line STRINGS shuffle exactly twice —
  * once hash-partitioned by line key for the anti-join, once by doc_id
  * for the rebuild — and the duplicated-key side is an aggregate
  * (md5 key, distinct-doc count) so no corpus-sized state concentrates
  * anywhere. Per-doc rebuild state is bounded by document length, never
  * corpus size. No reference counterpart (the reference has no text
  * curation); semantics follow the published CCNet dedup design.
  */
object LineDedup {

  /** Normalized dedup key text: lowercased, trimmed. Blank lines (empty
    * after trim) are NEVER counted as duplicates and never removed. */
  private def norm(line: Column): Column = trim(lower(line))

  /** One row per line: (doc_id, idx, line), idx 0-based original position.
    * `split` keeps empty segments (limit -1), so blank lines keep their
    * positions and round-trip through the rebuild. */
  private[text] def lines(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.operators.Spread.wideScan(docs, weight = 48L)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("idx", "line")))

  /** md5 keys of non-blank lines present in >= minDocs distinct docs. */
  private def dupKeys(ln: DataFrame, minDocs: Int): DataFrame =
    ln.where(length(norm(col("line"))) > 0)
      .select(md5(norm(col("line"))).as("__k"), col("doc_id"))
      .groupBy("__k")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("__k")

  /** Removes corpus-repeated lines from every document. Output is one row
    * per input doc: (doc_id, clean_text, n_lines, n_removed) — a doc whose
    * every line is boilerplate survives with clean_text = "". */
  def removeRepeatedLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val ln = lines(docs, idCol, textCol)
    val dup = dupKeys(ln, minDocs)
    // blank lines never appear in dup (filtered before keying), so the
    // anti-join keeps them unconditionally
    val kept = ln.withColumn("__k", md5(norm(col("line"))))
      .join(dup, Seq("__k"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("idx"), col("line"))))
        .as("__a"))
      .select(col("doc_id"),
        array_join(transform(col("__a"), x => x("line")), "\n")
          .as("clean_text"),
        size(col("__a")).cast("long").as("__n_kept"))
    // n_lines straight off the text — no extra aggregation over the
    // exploded lines
    val base = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), "\n", -1)).cast("long").as("n_lines"))
    base.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
  }
}
