package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, token
  * counting, language ID (marker-word heuristic), quality scoring,
  * fingerprinting. Every operator is a pure Column expression (codegen'd,
  * no UDFs), and each has an exactly-equivalent DuckDB SQL generator so the
  * oracle gate can verify it — both sides are generated from the same marker
  * tables below, keeping them in sync by construction.
  */
object TextAnalysis {

  /** Marker stopwords per language; order = deterministic tie-break order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "las", "es", "y", "una"))

  // ---- Column-expression side (Spark) ------------------------------------

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Corpus vocabulary: token → total occurrences + distinct docs
    * containing it, top `k` by occurrences with a deterministic token
    * tie-break. Explode + one groupBy shuffle + TakeOrdered —
    * vocabulary building for training pipelines. */
  def vocabulary(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("occurrences"), col("token"))
      .limit(k)

  /** Vocabulary-free BPE-ish subword token estimate (compiled expression;
    * see [[TextExpressions.BpeTokenCount]]): letter runs at ≈4 chars/token,
    * digits and punctuation one token each. */
  def bpeTokenCount(text: Column): Column = TextExpressions.bpeTokenCount(text)

  def charCount(text: Column): Column = length(text)

  /** Whitespace-collapsed lowercase normalization. */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Document fingerprint = md5 of normalized text (stable content hash for
    * exact dedup). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Occurrences of any marker word among the text's tokens (compiled
    * custom expression; see [[TextExpressions.MarkerCount]]). */
  def markerCount(text: Column, markers: Seq[String]): Column =
    TextExpressions.markerCount(text, markers)

  /** Predicted language: argmax of marker counts, first-listed wins ties,
    * `unknown` when no marker hits. */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerCount(text, ms) }
    val pred = scores.foldRight(lit("unknown")) { case ((lang, s), elseCol) =>
      val geAll = scores.map { case (_, o) => s >= o }.reduce(_ && _)
      when(s > 0 && geAll, lit(lang)).otherwise(elseCol)
    }
    pred
  }

  /** Heuristic quality score in [0,1]: length, stopword ratio, punctuation
    * ratio. All arithmetic is written in an identical expression shape on the
    * SQL side so both engines produce bit-identical doubles. */
  def qualityScore(text: Column): Column = {
    val nChars = charCount(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    val stops = markerCount(text, LangMarkers.head._2).cast("double")
    val punct = (charCount(text) -
      length(regexp_replace(lower(text), "[a-z0-9\\s]", ""))).cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val stopScore = least(stops / nToks * lit(5.0), lit(1.0))
    val punctScore = lit(1.0) - least(punct / nChars * lit(10.0), lit(1.0))
    lit(0.4) * lenScore + lit(0.4) * stopScore + lit(0.2) * punctScore
  }

  /** Distinct word n-gram shingles of the text. Implemented as a custom
    * Catalyst expression — the equivalent higher-order-function pipeline
    * (`array_distinct(transform(sequence(...)))`) evaluates its lambdas
    * interpreted and is ~50× slower on the dedup hot path. */
  def shingles(text: Column, n: Int): Column = TextExpressions.shingles(text, n)

  /** Gopher-style repetition signal: fraction of n-gram occurrences held by
    * the most frequent n-gram; NULL below n tokens. High values mark the
    * boilerplate/spam documents corpus-quality filters drop. */
  def repetitionRatio(text: Column, n: Int = 2): Column =
    TextExpressions.repetitionRatio(text, n)

  /** All n-token grams WITH repeats (unlike the per-doc-distinct
    * [[shingles]] used for Jaccard): compiled single-pass expression (the
    * builtin transform/sequence/slice chain interprets three HOFs per
    * gram — the q66 lesson, see TextExpressions.NGrams). */
  def ngrams(text: Column, n: Int): Column = TextExpressions.ngrams(text, n)

  /** Per-group n-gram diversity: distinct grams / total gram occurrences —
    * the corpus-level variety signal (low values flag template/boilerplate
    * sources; the per-document twin is [[repetitionRatio]]). One explode +
    * one groupBy; the division is one long/long IEEE op, engine-exact. */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(groupCol), explode(ngrams(col(textCol), n)).as("g"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct"))
      .withColumn("diversity",
        col("n_distinct").cast("double") / col("n_grams"))

  /** Per-document Shannon entropy of the token distribution, in integer
    * micro-nats — the information-density quality signal (near-zero for
    * repeated-token spam, ~ln(n_tokens) for fully varied text; the
    * classic complement to [[repetitionRatio]] in corpus-quality
    * filters, cf. Rae et al., "Scaling Language Models: … Gopher", 2021
    * §A.1.1 repetition heuristics).
    *
    * Determinism (the gate discipline): H = ln(N) − (Σ cᵢ·ln cᵢ)/N is
    * computed with each cᵢ·ln cᵢ term quantized to integer micro-units
    * BEFORE the per-doc sum — the sum is exact integer arithmetic with
    * no float-order freedom — and one fixed scalar IEEE expression
    * after. Two shuffles, both keyed by doc (then (doc, token)): the
    * same shape as exact per-doc vocabulary counting, scale-safe. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("c"))
      .withColumn("term_micro",
        floor(col("c").cast("double") * log(col("c").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum("term_micro").as("sum_clnc_micro"))
      .withColumn("entropy_micro",
        floor((log(col("n_tokens").cast("double")) -
          col("sum_clnc_micro").cast("double") / lit(1e6) /
            col("n_tokens").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))

  // ---- SQL-generator side (DuckDB oracle) --------------------------------

  def tokensSql(t: String): String = s"regexp_split_to_array(trim(lower($t)), '\\s+')"

  def tokenCountSql(t: String): String = s"len(${tokensSql(t)})"

  def bpeTokenCountSql(t: String): String =
    s"""COALESCE(list_sum(list_transform(regexp_extract_all($t, '[A-Za-z]+'), w -> CAST(ceil(len(w)/4.0) AS BIGINT))), 0)
       | + len(regexp_extract_all($t, '[0-9]'))
       | + len(regexp_extract_all($t, '[^A-Za-z0-9 \\t\\n\\r\\x0B\\f]'))""".stripMargin

  def normalizeSql(t: String): String = s"regexp_replace(trim(lower($t)), '\\s+', ' ', 'g')"

  def fingerprintSql(t: String): String = s"md5(${normalizeSql(t)})"

  def markerCountSql(t: String, markers: Seq[String]): String = {
    val list = markers.map(m => s"'$m'").mkString("[", ", ", "]")
    s"len(list_filter(${tokensSql(t)}, t -> list_contains($list, t)))"
  }

  def langIdSql(t: String): String = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerCountSql(t, ms) }
    val whens = scores.map { case (lang, s) =>
      val geAll = scores.map { case (_, o) => s"$s >= $o" }.mkString(" AND ")
      s"WHEN $s > 0 AND $geAll THEN '$lang'"
    }.mkString(" ")
    s"CASE $whens ELSE 'unknown' END"
  }

  def qualityScoreSql(t: String): String = {
    val nChars = s"CAST(length($t) AS DOUBLE)"
    val nToks = s"CAST(${tokenCountSql(t)} AS DOUBLE)"
    val stops = s"CAST(${markerCountSql(t, LangMarkers.head._2)} AS DOUBLE)"
    val punct = s"CAST(length($t) - length(regexp_replace(lower($t), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)"
    s"0.4 * least($nChars / 500.0, 1.0)" +
      s" + 0.4 * least($stops / $nToks * 5.0, 1.0)" +
      s" + 0.2 * (1.0 - least($punct / $nChars * 10.0, 1.0))"
  }

  def shinglesSql(t: String, n: Int): String = {
    val w = tokensSql(t)
    val parts = (1 to n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"(SELECT list_distinct(CASE WHEN len(w) >= $n THEN list_transform(range(len(w)-${n - 1}), i -> $parts) ELSE [] END) FROM (SELECT $w AS w) _t)"
  }
}
