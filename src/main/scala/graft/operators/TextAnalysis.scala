package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM data pipelines (SURVEY §2.6). All pure
  * column expressions — codegen-friendly, no UDFs, map-side only (the only
  * shuffles are whatever aggregation the caller adds).
  */
object TextAnalysis {

  /** Whitespace token count + BPE-ish regex token count (letter runs,
    * digit runs, and single non-alphanumeric marks — the coarse shape of a
    * byte-pair tokenizer's pretoken split). Computed by the one-pass
    * native [[graft.functions.TokenCounts]] run-length state machine; the
    * DuckDB oracle runs the equivalent lookaround-free RE2 pattern, and
    * TextSpec pins the two formulations equal. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.VectorFunctions.tokenCounts(col(textCol)).as("__t"))
      .select(
        col(idCol),
        col("__t.ws_tokens").as("ws_tokens"),
        col("__t.re_tokens").as("re_tokens"))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "on", "for", "with", "as", "at", "by")

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length — combined into a [0,1] score. The exact formula is arbitrary
    * (as all quality heuristics are); what matters is it's deterministic
    * and each signal is exposed. All four counters come from ONE native
    * pass over the text ([[graft.functions.TextQualityStats]]) instead of
    * four separate regex/split/array-filter evaluations — same SQL
    * semantics (the DuckDB oracle runs the regex formulation), ~5x less
    * per-row work on the hot path. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stats = graft.functions.VectorFunctions.textQualityStats(col(textCol), stopwords)
    // nullif guards the one divisor that can be zero (empty text -> 0
    // chars; ANSI division would otherwise kill the job on the first
    // empty document). n_toks is never 0: split yields >= 1 segment.
    val nChars = nullif(col("__q.n_chars").cast("double"), lit(0.0))
    val punct = col("__q.punct").cast("double")
    val nToks = col("__q.n_toks").cast("double")
    val stopHits = col("__q.stop_hits").cast("double")
    df.select(col(idCol), stats.as("__q"))
      .select(
        col(idCol),
        round((punct / nChars), 4).as("punct_ratio"),
        round((stopHits / nToks), 4).as("stopword_ratio"),
        round(nChars / nToks, 4).as("mean_word_len"),
        round(greatest(lit(0.0), least(lit(1.0),
          lit(0.5) + lit(0.5) * (stopHits / nToks) - (punct / nChars))), 4).as("quality_score"))
  }

  private[graft] val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "por", "para"),
    "it" -> Seq("il", "la", "gli", "e", "è", "non", "un", "una", "per", "con"))

  /** Character-trigram profiles (Cavnar-Trenkle style): each entry carries
    * its own boundary spaces and contributes all its 3-char windows —
    * function words AND bound morphology ("ung ", "ción ", "zione "), so
    * text with no stopword at all still scores. Hand-curated from the
    * highest-frequency trigrams of each language's function words and
    * productive affixes (public frequency lists). */
  private[graft] val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is ", " that ", " it ",
      " for ", " with ", " this ", " have ", " are ", " was ", " not ",
      " they ", " you ", "ing ", "tion ", "ally ", " wh"),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ",
      " ein ", " mit ", " von ", " zu ", " den ", " auf ", " werden ",
      " haben ", " für ", "ung ", "sch", "ich ", "keit ", "chen "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " pas ", " un ",
      " une ", " pour ", " dans ", " que ", " des ", " avec ", " sur ",
      " nous ", " vous ", "eux ", "aise ", "ment ", "çon"),
    "es" -> Seq(" el ", " los ", " las ", " es ", " no ", " por ",
      " para ", " que ", " con ", " se ", " del ", " una ", "ción ",
      "dad ", "miento ", "ando ", "iendo ", "año", "ñol"),
    "it" -> Seq(" il ", " gli ", " è ", " non ", " per ", " che ",
      " di ", " della ", " sono ", " nel ", " con ", " una ",
      "zione ", "mente ", "ità ", "ando "))

  /** Language-ID: character-trigram scoring per language in ONE native
    * pass over the text (rolling 3-char window + per-language hash sets —
    * see [[graft.functions.LangIdScore]]), argmax with alphabetical
    * tie-break, han/kana characters voting for zh. Trigrams beat the
    * stopword baseline on stopword-free text (morphology still scores) —
    * asserted on held-out samples in TextSpec. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = graft.functions.VectorFunctions.langIdScore(
      col(textCol), langTrigrams, cjkLang = Some("zh"), charNgram = 3)
    df.select(
      col(idCol),
      scored.getField("pred_lang").as("pred_lang"),
      scored.getField("hits").as("hits"))
  }

  /** The previous stopword-token scorer, kept as the comparison baseline
    * (TextSpec measures the trigram profiles against it). */
  private[graft] def langIdStopwordBaseline(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = graft.functions.VectorFunctions.langIdScore(
      col(textCol), langStops, cjkLang = Some("zh"))
    df.select(
      col(idCol),
      scored.getField("pred_lang").as("pred_lang"),
      scored.getField("hits").as("hits"))
  }

  /** Gopher-style quality filter rules (Rae et al. 2021, publicly
    * documented thresholds): word-count bounds, mean word length bounds,
    * symbol-to-word ratio, and minimum alphabetic-word ratio. Emits the
    * per-rule booleans plus the final keep decision so a pipeline can
    * report WHY documents drop — every signal is plain SQL (exact DuckDB
    * oracle). */
  def gopherFilter(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaWordRatio: Double = 0.8,
      maxBulletRatio: Double = 0.9, maxEllipsisRatio: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val words = split(trim(t), "\\s+")
    val nWords = size(words).cast("double")
    val meanLen = length(regexp_replace(t, "\\s+", "")).cast("double") / nWords
    val symbols = (length(t) - length(regexp_replace(t, "[#\\.\\*]", ""))).cast("double")
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double")
    // line-based rules (Rae et al. 2021 §A1.1): mostly-bullet and
    // mostly-ellipsis documents are list fragments / truncated crawls.
    // A document with no non-blank lines trivially passes (coalesce).
    val lines = filter(split(t, "\n"), l => trim(l) =!= "")
    val nLines = nullif(size(lines).cast("double"), lit(0.0))
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double")
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double")
    df.select(
      col(idCol),
      (nWords >= minWords && nWords <= maxWords).as("ok_word_count"),
      (meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen).as("ok_word_len"),
      (symbols / nWords <= maxSymbolRatio).as("ok_symbol_ratio"),
      (alphaWords / nWords >= minAlphaWordRatio).as("ok_alpha_ratio"),
      coalesce(bulletLines / nLines <= maxBulletRatio, lit(true)).as("ok_bullet_ratio"),
      coalesce(ellipsisLines / nLines <= maxEllipsisRatio, lit(true)).as("ok_ellipsis_ratio"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_word_len") &&
          col("ok_symbol_ratio") && col("ok_alpha_ratio") &&
          col("ok_bullet_ratio") && col("ok_ellipsis_ratio"))
  }

  /** Repetition statistics (the Gopher duplicate-line rules): line
    * count, distinct-line count, duplicate-line fraction and the
    * character fraction living in duplicated lines — the
    * boilerplate/navigation-chrome signal for web text. Pure column
    * expressions over the line split. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    val nLines = size(lines).cast("double")
    val nDistinct = size(array_distinct(lines)).cast("double")
    val totalChars = aggregate(lines, lit(0L), (a, l) => a + length(l)).cast("double")
    // chars in lines that appear more than once: total minus one copy of
    // each distinct line leaves extra copies; count chars of lines whose
    // text occurs earlier too — approximate via distinct-chars difference
    val distinctChars = aggregate(array_distinct(lines), lit(0L), (a, l) => a + length(l)).cast("double")
    df.select(
      col(idCol),
      nLines.cast("long").as("n_lines"),
      nDistinct.cast("long").as("n_distinct_lines"),
      round(when(nLines > 0, (nLines - nDistinct) / nLines).otherwise(0.0), 4)
        .as("dup_line_ratio"),
      round(when(totalChars > 0, (totalChars - distinctChars) / totalChars).otherwise(0.0), 4)
        .as("dup_line_char_ratio"))
  }

  /** Top-k terms per group (vocabulary statistics — the corpus-level
    * report behind stopword lists, tokenizer audits and contamination
    * checks). Terms are whitespace tokens of the lowercased text; counts
    * aggregate fully before the per-group rank, so the final window only
    * sees vocabulary-bounded (group, term) rows — never corpus-sized
    * data. Ties break on the term for determinism. */
  def topTerms(
      df: DataFrame, textCol: String, groupCol: String, k: Int = 5): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("n").desc, col("term").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("term"), col("n"), col("rk"))
  }

  /** Email address pattern — RE2-portable (no lookarounds) so the DuckDB
    * oracle applies the IDENTICAL regex. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Phone-ish pattern: international or separator-grouped digit runs. */
  private val phoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** PII scrubbing — the redaction pass every training-data pipeline runs
    * before text lands in a corpus. Pure column expressions (two regex
    * passes), map-side only; counts exposed per category so the pipeline
    * can alert on unexpectedly PII-heavy sources. */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_replace(regexp_replace(t, emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
        .as("clean_text"),
      size(regexp_extract_all(t, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(regexp_replace(t, emailRe, "[EMAIL]"),
        lit(phoneRe), lit(0))).as("n_phones"))
  }

  /** 64-bit rolling-hash document fingerprint over the normalized token
    * stream: fp = mix(fold(tokens, acc*1000003 + mix(tokenHash))) — the
    * native one-pass [[graft.functions.NormHash64]] (inline tokenization,
    * wraparound semantics, no regex/string arrays; TextSpec recomputes
    * the formula independently). Order-sensitive and
    * normalization-invariant. [[graft.functions.RollingFp64]] offers the
    * same fold over a caller-supplied array<string>. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      graft.functions.VectorFunctions.normHash64(col(textCol)).as("fp64"))

  /** Gopher duplicate word-n-gram statistics (Rae et al. 2021 repetition
    * rules, the n-gram half — [[repetitionStats]] covers duplicate
    * lines): per document, the n-gram count, how many occur more than
    * once, and the fraction of token characters covered by a duplicated
    * n-gram (marked coverage, bounded [0,1]). One native pass per row
    * ([[graft.functions.DupNgramStats]]); TextSpec recomputes the exact
    * definition brute-force. */
  def dupNgrams(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val stats = graft.functions.VectorFunctions.dupNgramStats(col(textCol), n)
    df.select(col(idCol), stats.as("__d"))
      .select(col(idCol),
        col("__d.n_grams").as("n_grams"),
        col("__d.n_dup_grams").as("n_dup_grams"),
        round(col("__d.dup_char_frac"), 4).as("dup_char_frac"))
  }

  /** Okapi BM25 scoring of every document against a FIXED term set (the
    * relevance-filter shape of an LLM-data pipeline: score a crawl
    * against a topic query, keep the tail above a threshold).
    *
    * Scale design: for a fixed small query there is NO inverted index and
    * NO token explode — per-term term frequencies are computed map-side
    * with array `filter`/`size` over the tokenized text, the corpus
    * statistics (N, avgdl, per-term document frequencies) reduce to ONE
    * broadcast row, and the score is a map-side expression. The only
    * shuffle is the single-row aggregate. idf = ln((N-df+0.5)/(df+0.5)+1)
    * (Lucene's non-negative variant). Every arithmetic step is written
    * identically in the DuckDB oracle, so the driver hash-checks it. */
  def bm25(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // tokens are lowercased, so query terms must be too (a cased term
    // would silently match nothing)
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"), t => t =!= lit(""))
    val base = df.select(
      Seq(col(idCol), size(toks).cast("double").as("__dl")) ++
        lowered.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("double").as(s"__tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1.0).otherwise(0.0)).as(s"__df$i")): _*)
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idf = log((col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)) + lit(1.0))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col(idCol), col("__dl").cast("long").as("dl"), round(score, 4).as("bm25"))
  }

  /** CROSS-DOCUMENT line dedup (the C4/RefinedWeb corpus-level rule:
    * a line occurring verbatim in >= `minDocFreq` DISTINCT documents is
    * boilerplate — nav bars, cookie banners, licence footers — and is
    * removed from EVERY document): lines explode with their position,
    * global document-frequency is ONE hash aggregation over 64-bit line
    * hashes (the full line text never shuffles — at 100 TB the count
    * table is the distinct-line count, not the corpus), repeated lines
    * anti-join away, and each document rebuilds in original line order.
    * Blank lines are structure, not content — never counted, never
    * removed. Returns (id, text_clean, n_lines, n_removed). */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int = 2): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would remove every non-blank line")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__blank", trim(col("__line")) === "")
      .withColumn("__lh", xxhash64(trim(col("__line"))))
    val repeated = lines.filter(!col("__blank"))
      .groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__lh"))
    // blank lines never enter `repeated` (filtered before the count), so
    // one hash anti-join keeps them and drops exactly the boilerplate
    val kept = lines.join(repeated, Seq("__lh"), "left_anti")
    kept.groupBy(col(idCol)).agg(
      array_join(transform(array_sort(
        collect_list(struct(col("__pos"), col("__line")))), x => x("__line")), "\n")
        .as("text_clean"),
      count(lit(1)).cast("int").as("n_kept"))
      .join(lines.groupBy(col(idCol)).agg(count(lit(1)).cast("int").as("n_lines")),
        Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0))).cast("int").as("n_removed"))
  }
}
