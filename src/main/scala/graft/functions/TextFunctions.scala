package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines.
  * Pure `functions._` compositions — fully codegen'd, no UDFs, so they
  * stay inside WholeStageCodegen and scale linearly with input bytes.
  */
object TextFunctions {

  /** Whitespace token count (single-space split, Python `str.split(' ')`). */
  def tokenCount(text: Column): Column =
    size(split(text, " ", -1)).cast("long")

  /** BPE-ish subword token estimate: word-and-punctuation regex split.
    * Counts runs of letters, runs of digits, and single punctuation marks
    * — a deterministic proxy for tokenizer counts when no vocab is loaded.
    */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Normalized text used for fingerprinting/dedup: lowercase, strip
    * everything but letters/digits/spaces, squeeze whitespace.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** HTML → text for web-crawl ingest (the boilerplate-strip step every
    * pretraining pipeline runs before quality/dedup): drop
    * script/style/comment blocks, strip remaining tags, decode the
    * common entities, collapse whitespace. Codegen'd regexp chain —
    * deliberately RE2-compatible patterns (non-greedy block match, no
    * lookaround) so a SQL engine re-derives it verbatim; a DOM parser
    * it is not (malformed nesting degrades to extra whitespace, never
    * to dropped text).
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script\\b.*?</script>", " "),
      "(?is)<style\\b.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Host of a URL (per-domain capping / source accounting): the
    * authority up to the first `/`, `:`, `?` or `#`, lowercased,
    * leading `www.` dropped; null when the string has no scheme.
    * Plain regexp_extract — identical in any RE2/Java engine.
    */
  def urlHost(url: Column): Column = {
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    when(host === "", lit(null))
      .otherwise(regexp_replace(host, "^www\\.", ""))
  }

  /** Unicode repair for ingest (the ftfy/C4 cleanup step): NFC
    * normalization plus control-character removal (tab/newline kept, CR
    * stripped). Codegen'd single pass — see `Kernels.normalizeTextEval`.
    */
  def normalizeText(text: Column): Column = graft.plans.Kernels.normalizeText(text)

  /** DEFLATE compression ratio (`compressed_bytes / raw_bytes`, level 6)
    * — the classic cheap redundancy signal (used by RefinedWeb-style
    * quality pipelines): machine-generated boilerplate and template
    * spam compress far below natural prose, so a low-ratio floor is a
    * one-pass junk filter. Codegen kernel, one thread-local Deflater —
    * see `Kernels.deflateRatioEval`. Empty text → 1.0; null → null.
    */
  def compressionRatio(text: Column): Column =
    graft.plans.Kernels.deflateRatio(text)

  /** Document fingerprint: md5 of the normalized text (hex). The rolling
    * n-gram variant for partial-overlap detection is `Similarity.shingles`
    * + minhash.
    */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Quality-score features (length / punctuation / stopword ratios).
    * Returns a struct; callers project what they score on.
    */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text)
    val nTokens = tokenCount(text)
    val nPunct = length(regexp_replace(text, "[^.!?,;:]", ""))
    val nUpper = length(regexp_replace(text, "[^A-Z]", ""))
    val nStop = size(regexp_extract_all(lower(text),
      lit("\\b(the|and|is|of|to|a|in|that|it|was)\\b"), lit(0)))
    struct(
      nChars.cast("long").as("n_chars"),
      nTokens.as("n_tokens"),
      (nChars.cast("double") / greatest(nTokens, lit(1L))).as("avg_token_len"),
      (nPunct.cast("double") / greatest(nChars, lit(1))).as("punct_ratio"),
      (nUpper.cast("double") / greatest(nChars, lit(1))).as("upper_ratio"),
      (nStop.cast("double") / greatest(nTokens, lit(1L))).as("stopword_ratio"))
  }

  /** CCNet/fastText-style quality-classifier score: logistic over the
    * [[qualityFeatures]] vector with caller-supplied weights
    * (intercept, avg_token_len, punct_ratio, upper_ratio,
    * stopword_ratio, log10(n_chars+1)). Training lives outside the hot
    * path (fit offline on labeled docs, ship coefficients); scoring is a
    * pure map-side codegen'd expression — the shape a 100 TB quality
    * filter needs. Pure `functions._`, so the DuckDB oracle recomputes
    * it bit-for-bit.
    */
  def qualityScore(text: Column, w: Array[Double]): Column = {
    require(w.length == 6, "weights: intercept + 5 feature coefficients")
    val f = qualityFeatures(text)
    val z = lit(w(0)) +
      f.getField("avg_token_len") * lit(w(1)) +
      f.getField("punct_ratio") * lit(w(2)) +
      f.getField("upper_ratio") * lit(w(3)) +
      f.getField("stopword_ratio") * lit(w(4)) +
      log10(f.getField("n_chars").cast("double") + lit(1.0)) * lit(w(5))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Repetition quality signals (Gopher-style, Rae et al. 2021 §A1.1):
    * duplicate-line fractions over '\n'-split trimmed lines, plus
    * most-frequent word-n-gram shares over normalized n-grams. High
    * values flag boilerplate/spam docs a training pipeline should drop.
    * Both stats run as single-pass codegen'd kernels
    * ([[graft.plans.Kernels.repStatsCore]]).
    */
  def repetitionFeatures(text: Column, n: Int = 2): Column = {
    import graft.plans.Kernels
    val ls = Kernels.lineRepStats(text)
    val gs = Kernels.repStats(Kernels.wordShingles(text, n))
    struct(
      element_at(ls, 1).as("dup_line_frac"),
      element_at(ls, 2).as("dup_line_char_frac"),
      element_at(gs, 3).as("top_ngram_freq_share"),
      element_at(gs, 4).as("top_ngram_char_share"))
  }

  /** Published Gopher document-rule stopword set (Rae et al. 2021
    * §A1.1): a doc must contain at least [[gopherFlags]]'s
    * `minStopHits` of these to pass the stopword rule.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-level quality rules (Rae et al. 2021 §A1.1) as a
    * struct of per-rule measurements plus boolean-as-long flags and the
    * conjunctive `pass`. Complements the repo's other published-filter
    * families: C4 line rules ([[graft.ml.Dedup.dedupLines]]), CCNet
    * classifier ([[qualityScore]]), Gopher repetition
    * ([[repetitionFeatures]]).
    *
    * Rules (thresholds are the published defaults, caller-tunable):
    *   1. word count in [minWords, maxWords]            (default 50..100k)
    *   2. mean word length in [3, 10]
    *   3. symbol-to-word ratio ('#' or '...') <= 0.1
    *   4. <= 90% of lines start with a bullet ('-' / '*')
    *   5. <= 30% of lines end with '...'
    *   6. >= 80% of words contain an alphabetic character
    *   7. >= minStopHits distinct required stopwords present
    *
    * Everything is a pure `functions._` composition over one
    * `split(text, ' ')` / `split(text, '\n')` pass — single map stage,
    * fully codegen'd, no shuffle: the shape a 100 TB quality gate needs
    * (ratios are exact-divisions of integer counts, so an external
    * engine recomputes them bit-for-bit for oracling).
    */
  def gopherFlags(
      text: Column,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopwords: Seq[String] = gopherStopwords,
      minStopHits: Int = 2): Column = {
    val toks = split(text, " ")
    val lows = split(lower(text), " ")
    val lines = split(text, "\n")
    val wordCount = size(toks).cast("long")
    val wordsD = wordCount.cast("double")
    val linesD = size(lines).cast("double")
    // mean word length via total non-space chars — one pass, no
    // per-token aggregate
    val nonspace = length(regexp_replace(text, " ", ""))
    val meanWordLen = nonspace.cast("double") / wordsD
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)
    val symbolRatio = (hashes + ellipses).cast("double") / wordsD
    val bulletRatio = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("*"))).cast("double") / linesD
    val ellipsisRatio = size(filter(lines, _.endsWith("..."))).cast("double") / linesD
    val alphaRatio = size(filter(toks, _.rlike("[a-zA-Z]"))).cast("double") / wordsD
    val stopHits = stopwords
      .map(s => array_contains(lows, s).cast("long"))
      .reduce(_ + _)
    val pass =
      wordCount.between(minWords, maxWords) &&
        meanWordLen.between(3.0, 10.0) &&
        symbolRatio <= 0.1 &&
        bulletRatio <= 0.9 &&
        ellipsisRatio <= 0.3 &&
        alphaRatio >= 0.8 &&
        stopHits >= minStopHits
    struct(
      wordCount.as("word_count"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(bulletRatio, 4).as("bullet_ratio"),
      round(ellipsisRatio, 4).as("ellipsis_ratio"),
      round(alphaRatio, 4).as("alpha_ratio"),
      stopHits.as("stop_hits"),
      pass.cast("long").as("pass"))
  }

  /** PII patterns for redaction — the scrub pass every training-data
    * pipeline runs before a corpus ships. Deliberately simple,
    * conservative regexes (emails, IPv4, international-ish phone
    * numbers, 13-16-digit card-like runs); swap in stricter ones per
    * deployment. Order matters: emails first so their digits don't get
    * phone-matched.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\b(?:\\d[ -]?){13,16}\\b" -> "<CARD>",
    "\\+?\\d{1,3}[ -]?\\(?\\d{2,4}\\)?[ -]?\\d{3}[ -]?\\d{3,4}" -> "<PHONE>")

  /** Replace every PII match with its tag. Chained codegen'd
    * `regexp_replace` — no UDF, pushes through whole-stage codegen.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Count of PII matches per kind → struct(n_email, n_ip, n_card,
    * n_phone): the audit metric (how much a corpus leaks) next to the
    * scrub ([[redactPii]]).
    */
  def piiCounts(text: Column): Column = {
    val ps = piiPatterns.map(_._1)
    struct(
      size(regexp_extract_all(text, lit(ps(0)), lit(0))).as("n_email"),
      size(regexp_extract_all(text, lit(ps(1)), lit(0))).as("n_ip"),
      size(regexp_extract_all(text, lit(ps(2)), lit(0))).as("n_card"),
      size(regexp_extract_all(text, lit(ps(3)), lit(0))).as("n_phone"))
  }

  /** Language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Word-boundary regexes per language.
    */
  val langProfiles: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu|mit|von)\\b",
    "en" -> "\\b(the|and|is|of|to|in|that|it|for|was)\\b",
    "es" -> "\\b(el|la|los|las|es|y|de|que|en|un)\\b",
    "fr" -> "\\b(le|la|les|est|et|des|que|en|une|dans)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  /** Per-language match score (match count / token count). */
  def langScore(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** Corpus accounting report: per group (source, language, shard …) —
    * `(n_docs, total_chars, total_tokens, avg_chars, min_chars,
    * max_chars)`. The first question asked of any training mix ("how
    * many tokens per source?") as ONE partial-aggregated pass: every
    * accumulator is map-side combining, the exchange carries one row
    * per group, text never shuffles. Token counts use the whitespace
    * [[tokenCount]] contract (engine-neutral, DuckDB re-derives it
    * exactly); `avg_chars` is the IEEE division of two exact integers,
    * identical in any engine.
    */
  def corpusReport(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      textCol: String): org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "corpusReport: no group columns")
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol)).cast("long")).as("total_chars"),
      sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
      (sum(length(col(textCol)).cast("long")) / count(lit(1))).as("avg_chars"),
      min(length(col(textCol))).as("min_chars"),
      max(length(col(textCol))).as("max_chars"))
  }

  /** Language-ID: argmax of stopword-profile scores with a fixed
    * first-wins tie-break in `langProfiles` order. Codegen'd CASE chain.
    */
  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (lang, pat) => lang -> langScore(text, pat) }
    // lang_i wins if its score >= every later score (first-wins ties)
    val cases = scores.zipWithIndex.dropRight(1).map { case ((lang, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      (rest.map(s >= _).reduce(_ && _), lang)
    }
    cases.foldRight(lit(langProfiles.last._1): Column) { case ((cond, lang), elseCol) =>
      when(cond, lit(lang)).otherwise(elseCol)
    }
  }
}
