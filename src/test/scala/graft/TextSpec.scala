package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.TextAnalysis

/** Value oracles for language-ID and fingerprinting — the two text ops
  * with no DuckDB-expressible oracle (SURVEY §6). */
class TextSpec extends SparkSpecBase {
  import spark.implicits._

  test("langId picks the right language on unambiguous text") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it is happy with the sun", "en"),
      (2L, "der hund und die katze sind nicht mit der maus", "de"),
      (3L, "le chat est dans la maison et les oiseaux sont pour toi", "fr"),
      (4L, "el perro y la casa es una maravilla por la noche", "es"),
      (5L, "il gatto non è per la casa e gli amici sono con te", "it"),
      (6L, "这是一个用于测试语言识别的中文句子", "zh"))
    val got = TextAnalysis.langId(samples.map(t => (t._1, t._2)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.foreach { case (id, _, lang) =>
      assert(got(id) == lang, s"doc $id: predicted ${got(id)}, expected $lang")
    }
  }

  test("langId ties break deterministically (no stopword hits -> alphabetically first)") {
    val got = TextAnalysis.langId(Seq((1L, "xyzzy plugh 42")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(got.getString(1) == "de") // all scores 0 -> highest pri wins; "de" sorts first
    assert(got.getInt(2) == 0)
  }

  test("trigram langId beats the stopword baseline on held-out samples") {
    // none of these sentences appear in the profiles; several contain NO
    // stopword at all, so the baseline can only score them by luck
    val heldOut = Seq(
      ("en", "people were walking quickly through unfamiliar streets"),
      ("en", "scientists discovered interesting things during the experiments"),
      ("de", "wissenschaftliche entwicklung verändert unsere gesellschaft grundlegend"),
      ("de", "freundlichkeit und ehrlichkeit bleiben wichtige eigenschaften"),
      ("fr", "nous mangeons lentement quelques légumes délicieux"),
      ("fr", "le gouvernement annonce des mesures pour la population"),
      ("es", "generaciones enteras trabajando duro construyeron ciudades enormes"),
      ("es", "la educación española necesita una transformación profunda"),
      ("it", "capiamo perfettamente queste situazioni complicate"),
      ("it", "la organizzazione della manifestazione procede velocemente"),
      ("zh", "机器学习模型需要大量训练数据"))
    val df = heldOut.zipWithIndex.map { case ((lang, text), i) => (i.toLong, text, lang) }
      .toDF("doc_id", "text", "want")
    def accuracy(pred: org.apache.spark.sql.DataFrame): Double = {
      val p = pred.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      heldOut.zipWithIndex.count { case ((lang, _), i) => p(i.toLong) == lang }.toDouble / heldOut.size
    }
    val trigram = accuracy(TextAnalysis.langId(df, "doc_id", "text"))
    val baseline = accuracy(TextAnalysis.langIdStopwordBaseline(df, "doc_id", "text"))
    assert(trigram >= 0.9, s"trigram accuracy $trigram")
    assert(trigram > baseline, s"trigram $trigram must beat stopword baseline $baseline")
    // deterministic across runs and partitionings
    val a = TextAnalysis.langId(df, "doc_id", "text").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.langId(df.repartition(5), "doc_id", "text").collect().map(_.toSeq).toSeq
    assert(a.toSet == b.toSet)

    // confusion matrix over the held-out set: print the artifact and
    // assert per-language correctness (every diagonal cell dominates its
    // row — no language systematically absorbed by another)
    val pred = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val langs = heldOut.map(_._1).distinct.sorted
    val confusion: Map[(String, String), Int] =
      heldOut.zipWithIndex.groupBy { case ((want, _), i) => (want, pred(i.toLong)) }
        .view.mapValues(_.size).toMap
    info("langid confusion matrix (rows=truth, cols=predicted):")
    info(("truth\\pred" +: langs).mkString("\t"))
    for (t <- langs)
      info((t +: langs.map(p => confusion.getOrElse((t, p), 0).toString)).mkString("\t"))
    for (t <- langs) {
      val row = langs.map(p => confusion.getOrElse((t, p), 0))
      val diag = confusion.getOrElse((t, t), 0)
      assert(diag == row.max && diag > 0,
        s"language $t: diagonal $diag must dominate its row ${row.mkString(",")}")
    }
  }

  test("fingerprint matches the documented rolling-hash formula exactly") {
    // independent reimplementation of the documented formula: regex
    // tokenization + splitmix64 finalizer + 1000003 rolling fold
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def expectedFp(text: String): Long = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").filter(_.nonEmpty)
      mix(toks.foldLeft(0L)((acc, t) =>
        acc * 1000003L + mix(t.foldLeft(0L)((h, c) => h * 31L + c))))
    }
    val texts = Seq((1L, "Hello, World!"), (2L, "a b c"), (3L, "c b a"),
      (4L, "The  quick   brown fox"), (5L, "hello world"))
    val got = TextAnalysis.fingerprint(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == expectedFp(t), s"doc $id fingerprint mismatch")
    }
    // order sensitivity and normalization
    assert(got(2L) != got(3L), "fingerprint must be order-sensitive")
    assert(got(1L) == expectedFp("hello world"), "punctuation/case must normalize away")
    assert(got(1L) == got(5L))
  }

  test("redact scrubs emails and phone numbers, counts per category") {
    val samples = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.io and c.d@e-f.org"),
      (4L, "digits 12345 are not a phone but 0044 207 946 0958 is"))
    val got = TextAnalysis.redact(samples.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L)._1 == "contact me at [EMAIL] or call [PHONE] now", got(1L))
    assert(got(1L)._2 == 1 && got(1L)._3 == 1)
    assert(got(2L) == (("no pii here at all", 0, 0)))
    assert(got(3L)._1 == "two mails: [EMAIL] and [EMAIL]")
    assert(got(3L)._2 == 2)
    assert(got(4L)._1.contains("[PHONE]") && !got(4L)._1.contains("0958"))
    assert(got(4L)._1.contains("12345"), "short digit runs stay")
  }

  test("repetitionStats: duplicate-line and char fractions") {
    val samples = Seq(
      (1L, "alpha\nbeta\ngamma"),                 // all distinct
      (2L, "menu\ncontent here\nmenu\nmenu"),     // 2 dup lines of 4
      (3L, "single"),
      (4L, ""))
    val got = TextAnalysis.repetitionStats(samples.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((3L, 3L, 0.0, 0.0)))
    assert(got(2L)._1 == 4L && got(2L)._2 == 2L)
    assert(got(2L)._3 == 0.5)
    // chars: total = 4+12+4+4 = 24, distinct = 4+12 = 16 -> 8/24
    assert(math.abs(got(2L)._4 - 0.3333) < 1e-9)
    assert(got(3L) == ((1L, 1L, 0.0, 0.0)))
    assert(got(4L)._1 == 0L && got(4L)._3 == 0.0)
  }

  test("gopherFilter rules fire on the right pathologies") {
    val good = (1 to 30).map(i => s"word$i").mkString(" ")
    val samples = Seq(
      (1L, good),                                       // passes everything
      (2L, "too short"),                                // word count
      (3L, (1 to 30).map(_ => "a").mkString(" ")),      // mean word len < 3
      (4L, (1 to 30).map(i => s"word$i ###").mkString(" ")), // symbol ratio
      (5L, (1 to 30).map(_ => "123456").mkString(" ")),  // alpha ratio
      (6L, (1 to 30).map(i => s"- bullet item$i").mkString("\n")), // all-bullet lines
      (7L, (1 to 30).map(i => s"truncated line$i...").mkString("\n"))) // all-ellipsis lines
    val got = TextAnalysis.gopherFilter(samples.toDF("doc_id", "text"),
        "doc_id", "text", minWords = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
    assert(got(1L) == ((true, true, true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._7)
    assert(!got(3L)._2 && !got(3L)._7)
    assert(!got(4L)._3 && !got(4L)._7)
    assert(!got(5L)._4 && !got(5L)._7)
    assert(!got(6L)._5 && !got(6L)._7, "mostly-bullet doc must fail ok_bullet_ratio")
    assert(!got(7L)._6 && !got(7L)._7, "mostly-ellipsis doc must fail ok_ellipsis_ratio")
    // single-line prose is unaffected by the line rules
    assert(got(1L)._5 && got(1L)._6)
  }

  test("native qualityScore equals the SQL regex formulation, including whitespace edge cases") {
    val stops = Seq("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it", "on", "for", "with", "as", "at", "by")
    // the previous 4-pass Column formulation, kept as the in-test oracle
    def sqlFormulation(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val t = col("text")
      val toks = split(trim(lower(t)), "\\s+")
      val nChars = nullif(length(t).cast("double"), lit(0.0)) // same empty-text guard as production
      val punct = (length(t) - length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))).cast("double")
      val nToks = size(toks).cast("double")
      val stopHits = size(filter(toks, w => w.isin(stops.map(_.asInstanceOf[Any]): _*))).cast("double")
      df.select(col("doc_id"),
        round((punct / nChars), 4).as("punct_ratio"),
        round((stopHits / nToks), 4).as("stopword_ratio"),
        round(nChars / nToks, 4).as("mean_word_len"),
        round(greatest(lit(0.0), least(lit(1.0),
          lit(0.5) + lit(0.5) * (stopHits / nToks) - (punct / nChars))), 4).as("quality_score"))
    }
    val edge = Seq(
      (1L, ""), (2L, "   "), (3L, "\tthe fox\n"), (4L, "theand\fof"),
      (5L, "the the THE tHe"), (6L, "!!!"), (7L, " a b "), (8L, "héllo wörld"),
      (9L, "x"), (10L, "the quick brown fox and the lazy dog is at it"))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus)) {
      def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
        (1 to 4).map(i => if (r.isNullAt(i)) null else r.getDouble(i))
      val want = sqlFormulation(df).collect().map(key).toMap
      val got = TextAnalysis.qualityScore(df, "doc_id", "text").collect().map(key).toMap
      assert(got.size == want.size)
      for ((id, w) <- want) assert(got(id) == w, s"doc $id: got ${got(id)}, want $w")
    }
  }

  test("native tokenCounts equals the regex formulation, including edge cases") {
    def regexFormulation(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"))
    val edge = Seq(
      (1L, ""), (2L, "   "), (3L, "\tfoo bar\n"), (4L, "abc123def"),
      (5L, "Hello, World! 42"), (6L, "a-b_c.d"), (7L, "héllo wörld"),
      (8L, "x  \t y"), (9L, "...")).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus)) {
      def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> (r.getInt(1), r.getInt(2))
      val want = regexFormulation(df).collect().map(key).toMap
      val got = TextAnalysis.tokenCounts(df, "doc_id", "text").collect().map(key).toMap
      assert(got.size == want.size)
      for ((id, w) <- want) assert(got(id) == w, s"doc $id: got ${got(id)}, want $w")
    }
  }

  test("dupNgrams equals a brute-force recompute of the marked-coverage definition") {
    def brute(text: String, n: Int): (Int, Int, Double) = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toVector
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector
      if (grams.isEmpty) return (0, 0, 0.0)
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      val covered = Array.fill(toks.size)(false)
      var dup = 0
      for ((g, i) <- grams.zipWithIndex if counts(g) > 1) {
        dup += 1
        (i until i + n).foreach(covered(_) = true)
      }
      val total = toks.map(_.length).sum
      val dupChars = toks.zipWithIndex.filter { case (_, i) => covered(i) }.map(_._1.length).sum
      (grams.size, dup,
        BigDecimal(if (total == 0) 0.0 else dupChars.toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val edge = Seq(
      (1L, "a b c a b c a b c"),                // every trigram duplicated
      (2L, "one two three four five six"),      // none duplicated
      (3L, "x y"),                              // fewer than n tokens
      (4L, ""),                                 // empty
      (5L, "spam spam spam spam spam"),         // degenerate repetition
      (6L, "The cat; the CAT... the cat!"))     // normalization collapses
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus)) {
      val want = df.collect().map(r => r.getLong(0) -> brute(r.getString(1), 3)).toMap
      val got = TextAnalysis.dupNgrams(df, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
      assert(got.size == want.size)
      for ((id, w) <- want) assert(got(id) == w, s"doc $id: got ${got(id)}, want $w")
    }
    // sanity on the degenerate cases
    val g = TextAnalysis.dupNgrams(edge, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(g(1L) == 1.0 && g(2L) == 0.0 && g(3L) == 0.0 && g(5L) == 1.0)
  }

  test("bm25 matches a hand-computed Okapi score on a tiny corpus") {
    val corpus = Seq(
      (1L, "data data query"),        // tf(data)=2, tf(query)=1, dl=3
      (2L, "vector vector vector"),   // tf(vector)=3, dl=3
      (3L, "other words entirely here")) // dl=4, no hits
      .toDF("doc_id", "text")
    val terms = Seq("data", "query", "vector")
    val got = TextAnalysis.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val n = 3.0
    val avgdl = (3.0 + 3.0 + 4.0) / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def part(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df(data)=1, df(query)=1, df(vector)=1
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == r4(part(2, 1, 3) + part(1, 1, 3) + part(0, 1, 3)))
    assert(got(2L)._2 == r4(part(0, 1, 3) + part(0, 1, 3) + part(3, 1, 3)))
    assert(got(3L)._2 == r4(0.0))
    assert(got(1L)._2 > got(3L)._2 && got(2L)._2 > got(3L)._2)
  }

  test("fingerprint is stable on the real documents table") {
    val a = TextAnalysis.fingerprint(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TextAnalysis.fingerprint(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("dedupLines strips cross-document boilerplate, keeps order, blanks and unique lines") {
    val docs = Seq(
      (1L, "intro one\nCOOKIE BANNER\n\nbody of one\nFOOTER 2024"),
      (2L, "intro two\nCOOKIE BANNER\nbody of two\nFOOTER 2024"),
      (3L, "intro three\n  COOKIE BANNER  \nbody of three"), // trim-normalized match
      (4L, "standalone doc\n\n\n")) // trailing blanks survive whole
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    // boilerplate in >= 2 docs drops everywhere (incl. the padded copy);
    // FOOTER appears twice -> drops; unique bodies + blank lines stay in order
    assert(got(1L) == ("intro one\n\nbody of one", 5, 2))
    assert(got(2L) == ("intro two\nbody of two", 4, 2))
    assert(got(3L) == ("intro three\nbody of three", 3, 1))
    assert(got(4L) == ("standalone doc\n\n\n", 4, 0))
    // higher threshold: the 2-doc footer survives, the 3-doc banner drops
    val loose = TextAnalysis.dedupLines(docs, "doc_id", "text", minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(loose == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 0))
    intercept[IllegalArgumentException](
      TextAnalysis.dedupLines(docs, "doc_id", "text", minDocFreq = 1))
  }
}
