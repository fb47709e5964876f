package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-span detection and removal — the token-level
  * form of exact-substring training-data dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): a span of
  * `k` consecutive tokens that occurs in two or more distinct documents is
  * a memorization hot-spot; remove the span, keep the rest of the document.
  * Complements the document-level families (exact [[NearDup.exactDupGroups]],
  * near-dup [[NearDup.jaccardPairs]]/[[MinHashLSH]]): those drop whole
  * documents, this scrubs repeated passages out of documents that are
  * otherwise unique (boilerplate headers, license blocks, quoted chunks).
  *
  * Shape, and why it scales: spans are enumerated per document with a
  * narrow generator (no shuffle), carried as a 128-bit hash pair — two
  * independent xxhash64 seeds; 2×64 bits keeps the collision expectation
  * negligible at 100 TB span counts where a single 64-bit key would
  * collide (~10^13 spans ⇒ ~10^6 birthday collisions at 64 bits, ~0 at
  * 128) — so the span STRING never shuffles. Cross-doc duplication is one
  * groupBy on the hash pair; marking joins the (distinct-keyed, so no
  * fan-out) duplicated set back on the same key, letting AQE reuse or
  * broadcast the dup side. Everything downstream is per-document and
  * bounded by document length. Total cost: O(total tokens) rows through
  * two hash-pair-keyed shuffles.
  */
object SpanDedup {

  /** (doc_id, pos, h1, h2) for every k-token window of every doc with at
    * least `k` tokens; `pos` is the 0-based token offset of the window
    * start, (h1, h2) the 128-bit span fingerprint. */
  private[text] def spans(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    graft.operators.Spread.wideScan(docs, weight = 48L)
      .select(col(idCol).as("doc_id"), toks.as("__t"))
      .where(size(col("__t")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("__t")) - k),
        i => array_join(slice(col("__t"), i + lit(1), lit(k)), " "))))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("col")).as("h1"),
        // literal FIRST: multi-arg xxhash64 chains left-to-right with the
        // running hash as seed, so xxhash64(span, lit) would be a pure
        // function of h1 (h1 collision ⟹ h2 collision — 64 bits of
        // entropy, not 128). xxhash64(lit, span) re-hashes the span under
        // an independent seed (hash(0x5eed, 42)).
        xxhash64(lit(0x5eed), col("col")).as("h2"))
  }

  /** Hash pairs of spans occurring in >= `minDocs` distinct documents —
    * one row per duplicated span (distinct key, safe to join back without
    * fan-out). */
  private def dupSpanKeys(sp: DataFrame, minDocs: Int): DataFrame =
    sp.groupBy("h1", "h2")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("h1", "h2")

  /** Per-document repeated-span profile: for every doc with >= `k` tokens,
    * the number of k-token spans (`n_spans`) and how many of those span
    * OCCURRENCES also appear in at least `minDocs` distinct documents
    * (`n_dup_spans`; a span repeated within one doc counts each occurrence).
    * Returns (doc_id, n_spans, n_dup_spans). */
  def markRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2): DataFrame = {
    val sp = spans(docs, idCol, textCol, k)
    val dup = dupSpanKeys(sp, minDocs).withColumn("__d", lit(1))
    sp.join(dup, Seq("h1", "h2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), count(col("__d")).as("n_dup_spans"))
  }

  /** Span-level cross-corpus contamination (the GPT-3/PaLM benchmark-
    * decontamination method): a training doc is contaminated if any of
    * its k-token spans also occurs in the reference (eval) corpus.
    * Returns (doc_id, n_spans, n_hits) for every corpus doc with >= k
    * tokens — n_hits = how many of its span occurrences appear anywhere
    * in `ref`. Filter n_hits > 0 to drop, or join back for span-level
    * scrubbing. The ref side is distinct span keys (tiny next to a 100 TB
    * corpus — eval suites are small), so the join back broadcasts and
    * fans nothing out. */
  def crossSpanContamination(corpus: DataFrame, idCol: String,
      textCol: String, ref: DataFrame, refIdCol: String, refTextCol: String,
      k: Int): DataFrame = {
    val sp = spans(corpus, idCol, textCol, k)
    val refKeys = spans(ref, refIdCol, refTextCol, k)
      .select("h1", "h2").distinct().withColumn("__hit", lit(1))
    sp.join(refKeys, Seq("h1", "h2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), count(col("__hit")).as("n_hits"))
  }

  /** Scrub cross-doc repeated spans out of every document: tokens covered
    * by any duplicated k-span occurrence are dropped, the remaining tokens
    * are rejoined with single spaces. Output is one row per input doc:
    * (doc_id, clean_text, n_removed) — `clean_text` is NORMALIZED
    * (lowercased, whitespace collapsed; same normalization every text
    * operator here applies), `n_removed` the count of dropped token
    * positions. Docs shorter than `k` tokens pass through with
    * n_removed = 0. Overlapping duplicated spans remove the union of
    * their positions, never a position twice. */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val sp = spans(docs, idCol, textCol, k)
    val dup = dupSpanKeys(sp, minDocs)
    // covered token positions per doc: union of [pos, pos+k) over
    // duplicated occurrences; collect_set dedupes overlap. The per-doc set
    // is bounded by document length, never by corpus size.
    val cov = sp.join(dup, Seq("h1", "h2"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("p"))
      .groupBy("doc_id")
      .agg(collect_set(col("p")).as("__cov"))
    toks.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(filter(col("__t"), (t: Column, i: Column) =>
          !coalesce(array_contains(col("__cov"), i), lit(false))), " ")
          .as("clean_text"),
        coalesce(size(col("__cov")), lit(0)).as("n_removed"))
  }
}
