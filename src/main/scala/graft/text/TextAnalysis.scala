package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-training-data pipelines:
  * tokenization, quality scoring, language ID, shingling.
  *
  * Every scalar here is a composition of built-in (whole-stage-codegen'd)
  * Spark functions — no UDF closures — and each has an exact SQL mirror
  * (the `*Sql` methods, DuckDB dialect) built from the SAME constants, so
  * an oracle engine reproduces the values bit-for-bit (doubles: identical
  * operation order; callers round outputs to a 1e-4 grain ≫ libm jitter
  * before hash-compare).
  *
  * The reference engine has no text surface (SURVEY §2.7: its only scalar
  * UDFs are geodesic distance and csv formatting —
  * `/root/reference/pipelines/stations.py:18-22`,
  * `/root/reference/pipelines/total_distance.py:50-52`); this module is
  * part of graft's LLM-pipeline extension surface.
  */
object TextAnalysis {

  /** Whitespace tokenizer. One definition used by every operator below. */
  def tokens(text: Column): Column = split(text, " ")

  def tokensSql(text: String): String = s"string_split($text, ' ')"

  /** SLIDING-WINDOW PASSAGE CHUNKING — the retrieval/pretraining prep
    * stage that turns documents into fixed-token-window passages with
    * overlap (window `window`, step `stride`; `stride < window` ⇒
    * consecutive chunks share `window − stride` tokens, so a fact
    * spanning a boundary survives in at least one chunk). Chunk starts
    * are 0, stride, 2·stride … while start < n_tokens; the tail chunk
    * is short rather than dropped (a drop would lose the document's
    * end). Output: one row per (doc, chunk) with stable `chunk_id`,
    * the token start offset, the chunk text, and its token count —
    * provenance a retrieval index needs to cite back into documents.
    *
    * Scale: pure map-side fan-out (split + sequence + explode in scan
    * codegen) — no shuffle at all; output cardinality ≈ corpus tokens
    * / stride, the expected blow-up of overlap chunking. */
  def chunkPassages(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkPassages: need 0 < stride <= window, got $window/$stride")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0),
          (floor((col("__n") - 1) / lit(stride)) * stride).cast("int"),
          lit(stride))).as("__cs"))
      .select(col(idCol),
        (col("__cs") / lit(stride)).cast("long").as("chunk_id"),
        col("__cs").cast("long").as("chunk_start"),
        concat_ws(" ",
          slice(col("__toks"), col("__cs") + 1, lit(window)))
          .as("chunk_text"),
        least(lit(window), col("__n") - col("__cs")).cast("long")
          .as("n_tokens"))
  }

  /** DuckDB mirror of [[chunkPassages]] over `table` — same tokenizer,
    * same start set (range step), same inclusive 1-based slice. */
  def chunkPassagesSql(table: String, idCol: String, textCol: String,
      window: Int, stride: Int): String =
    s"""SELECT $idCol,
       |       CAST(cs / $stride AS BIGINT) AS chunk_id,
       |       CAST(cs AS BIGINT) AS chunk_start,
       |       array_to_string(t[cs + 1 : cs + $window], ' ') AS chunk_text,
       |       CAST(LEAST($window, n - cs) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT $idCol, t, n, unnest(range(0, CAST(n AS BIGINT), $stride)) AS cs
       |  FROM (SELECT $idCol, ${tokensSql(textCol)} AS t,
       |               len(${tokensSql(textCol)}) AS n
       |        FROM $table WHERE $textCol IS NOT NULL)
       |  WHERE n > 0
       |)""".stripMargin

  /** Occurrences of blocklisted tokens — the C4-style content filter
    * signal (Raffel et al. 2020 drop any page containing a "bad word";
    * gentler pipelines gate on the count or rate instead, which is why
    * the COUNT is the primitive and the drop decision stays with the
    * caller). Exact token equality, not substring — "class" is not a
    * hit for "ass". Builtin HOF composition → whole-stage codegen. */
  def badTokenCount(text: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "badTokenCount: empty blocklist")
    size(filter(tokens(text),
      t => array_contains(array(blocklist.map(lit): _*), t)))
  }

  /** DuckDB mirror of [[badTokenCount]]. */
  def badTokenCountSql(text: String, blocklist: Seq[String]): String = {
    val lst = blocklist.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(${tokensSql(text)}, t -> list_contains($lst, t)))"
  }

  /** English-ish stopword list used for quality scoring. */
  // derived from the kernel's canonical list — one source of truth for
  // the fused kernel, the composed column form, and the SQL mirrors
  val stopwords: Seq[String] = graft.expr.TextStatsKernels.StopwordList

  /** Per-language marker (stopword) lists for the language-ID heuristic.
    * Deterministic argmax, ties broken by list order below; score 0 → "und".
    * (A real deployment would use char-n-gram profiles; the marker-word
    * heuristic is the classic cheap variant and is exactly SQL-mirrorable.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "you", "zai"))

  private def inList(w: Column, words: Seq[String]): Column =
    w.isin(words.map(_.asInstanceOf[Any]): _*)

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Number of whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  def tokenCountSql(text: String): String = s"len(${tokensSql(text)})"

  /** BPE-style pre-tokenizer pattern: letter runs, digit runs, then any
    * single non-letter/digit/space symbol — the word-boundary split a
    * byte-pair tokenizer applies before merging (simplified to an
    * RE2/POSIX-portable core so Spark and the SQL mirror agree). */
  val BpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Subword-style token count: number of BPE-pretokenizer matches. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  def bpeTokenCountSql(text: String): String =
    s"len(regexp_extract_all($text, '$BpePattern'))"

  /** Mean token length in characters, exactly: (chars − spaces) / tokens.
    * Integer arithmetic then ONE division — identical across engines. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text).cast("double")

  def avgTokenLenSql(text: String): String =
    s"CAST(length($text) - (${tokenCountSql(text)} - 1) AS DOUBLE) / " +
      s"CAST(${tokenCountSql(text)} AS DOUBLE)"

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), w => inList(w, stopwords))).cast("double") /
      tokenCount(text).cast("double")

  def stopwordRatioSql(text: String): String =
    s"CAST(len(list_filter(${tokensSql(text)}, w -> w IN ${sqlList(stopwords)})) AS DOUBLE) / " +
      s"CAST(${tokenCountSql(text)} AS DOUBLE)"

  /** Fraction of distinct tokens (type/token ratio — lexical diversity). */
  def distinctRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") /
      tokenCount(text).cast("double")

  def distinctRatioSql(text: String): String =
    s"CAST(len(list_distinct(${tokensSql(text)})) AS DOUBLE) / " +
      s"CAST(${tokenCountSql(text)} AS DOUBLE)"

  /** Document quality score in [0,1]: length balance + non-stopword mass +
    * word-length balance + lexical diversity. Fixed weights; operation
    * order identical in the SQL mirror. */
  def qualityScore(text: Column): Column =
    lit(0.3) * least(lit(1.0), tokenCount(text).cast("double") / lit(100.0)) +
      lit(0.3) * (lit(1.0) - stopwordRatio(text)) +
      lit(0.2) * least(lit(1.0), avgTokenLen(text) / lit(8.0)) +
      lit(0.2) * distinctRatio(text)

  def qualityScoreSql(text: String): String =
    s"0.3 * LEAST(1.0, CAST(${tokenCountSql(text)} AS DOUBLE) / 100.0) + " +
      s"0.3 * (1.0 - ${stopwordRatioSql(text)}) + " +
      s"0.2 * LEAST(1.0, ${avgTokenLenSql(text)} / 8.0) + " +
      // parens are load-bearing: without them SQL computes (0.2*a)/b,
      // Spark computes 0.2*(a/b) — off by 1 ulp on some inputs, which a
      // `quality >= threshold` comparison then resolves differently
      s"0.2 * (${distinctRatioSql(text)})"

  /** Marker-count score for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), w => inList(w, markers)))

  /** Predicted language code: argmax marker count, ties → [[langMarkers]]
    * order, all-zero → "und". */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (code, markers) =>
      code -> langScore(text, markers)
    }
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // Fold from the end so the FIRST language in list order wins ties.
    val firstMax = scores.reverse.foldLeft(lit("und")) {
      case (acc, (code, s)) => when(s === maxScore, lit(code)).otherwise(acc)
    }
    when(maxScore === 0, lit("und")).otherwise(firstMax)
  }

  def langIdSql(text: String): String = {
    val scoreSqls = langMarkers.map { case (code, markers) =>
      code -> s"len(list_filter(${tokensSql(text)}, w -> w IN ${sqlList(markers)}))"
    }
    val maxSql = scoreSqls.map(_._2).mkString("GREATEST(", ", ", ")")
    // CASE walks langMarkers order → first max wins, same as the fold.
    val whens = scoreSqls
      .map { case (code, s) => s"WHEN $s = $maxSql THEN '$code'" }
      .mkString(" ")
    s"CASE WHEN $maxSql = 0 THEN 'und' $whens ELSE 'und' END"
  }

  /** Distinct word n-gram shingles (the unit of Jaccard similarity for
    * near-dup detection). Documents shorter than n yield one whole-document
    * shingle so they can still match. Native codegen kernel — the composed
    * form below is 25× slower because higher-order functions run
    * interpreted outside whole-stage codegen. */
  def shingles(text: Column, n: Int): Column =
    graft.expr.ShinglesExpr(text, n)

  /** The built-in-functions composition of [[shingles]] — kept as the
    * executable spec of the kernel's semantics (equivalence is asserted in
    * TextAnalysisSpec) and as the form other engines can reproduce. */
  def shinglesComposed(text: Column, n: Int): Column = {
    val ws = tokens(text)
    val ngrams = transform(
      sequence(lit(0), greatest(size(ws) - lit(n), lit(0))),
      i => concat_ws(" ", (0 until n).map(j => try_element_at(ws, i + lit(j + 1))): _*))
    array_distinct(ngrams)
  }

  /** The DuckDB shingle expression over a token-list column `ws` (1-indexed
    * lists; concat_ws skips out-of-range NULLs, same as the Column form). */
  def shinglesOverWsSql(n: Int): String = {
    val parts = (0 until n).map(j => s"ws[i + $j]").mkString(", ")
    s"list_distinct([concat_ws(' ', $parts) " +
      s"for i in generate_series(1, GREATEST(len(ws) - ${n - 1}, 1))])"
  }
}
