package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split long documents into overlapping
  * token-window chunks — the complement of [[SequencePacking]] (packing
  * combines short docs; chunking splits long ones to fit a model context).
  *
  * Chunk k covers tokens [k·stride, k·stride + chunkSize); the last chunk
  * may be shorter. A doc with ≤ chunkSize tokens yields exactly one chunk.
  * All chunk math is integer arithmetic over the token array —
  * deterministic and oracle-reproducible.
  *
  * Scale: tokenize → per-row slice build + `posexplode` — a narrow
  * generator pass, no shuffle; output rows per doc =
  * 1 + max(0, ceil((tokens − chunkSize)/stride)). The slices are built
  * INSIDE the generator input (transform over the chunk indexes), so each
  * exploded row carries only its own ≤ chunkSize tokens — never a copy of
  * the whole document array per chunk.
  */
object Chunking {

  /** (idCol, chunk_no, chunk_tokens, chunk_text) — one row per chunk. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: $stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    // K = last chunk index: 0 when n <= chunkSize, else ceil((n-size)/stride)
    val k = when(n <= lit(chunkSize), lit(0L))
      .otherwise(
        ((n - lit(chunkSize) + lit(stride) - 1) / lit(stride)).cast("long"))
    df.select(col(idCol), toks.as("__toks"), k.as("__k"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), col("__k")),
          i => slice(col("__toks"), (i * stride + 1).cast("int"), lit(chunkSize))))
          .as(Seq("chunk_no", "__slice")))
      .select(col(idCol), col("chunk_no").cast("long").as("chunk_no"),
        size(col("__slice")).cast("long").as("chunk_tokens"),
        array_join(col("__slice"), " ").as("chunk_text"))
  }
}
