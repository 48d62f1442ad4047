package graft.ml

import graft.functions.TextFunctions
import graft.operators.{Filters, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the pass a training-data pipeline runs
  * over raw documents before tokenization. Composes the individually
  * verified pieces into one declarative plan:
  *
  *  1. language filter (predicted [[TextFunctions.langId]] ∈ allowed)
  *  2. length bounds on token count
  *  3. repetition filter (dup-line fraction, top-2-gram char share —
  *     [[TextFunctions.repetitionFeatures]])
  *  4. exact near-dup removal (min-id winner per content fingerprint)
  *  5. reproducible sample (modulo rule, [[Sampling.moduloSample]])
  *  6. PII scrub of the survivors ([[TextFunctions.redactPii]])
  *
  * Scale shape: stages 1-3 and 5-6 are narrow map-side work over one
  * scan; the only shuffle is the dedup groupBy in stage 4 (one
  * `min_by` exchange — no window sort, no second winner-gather join).
  * Scrubbing runs LAST so the regex chain only touches kept rows.
  * Fuzzy dedup (minhash/simhash/SemDeDup) intentionally stays a
  * separate pass — at 100 TB you run it once, materialize the pair
  * set, and audit it before deleting anything.
  */
object Curate {

  case class Config(
      langs: Set[String] = Set("en", "de", "fr", "es"),
      minTokens: Long = 5L,
      maxTokens: Long = 1000000L,
      maxDupLineFrac: Double = 1.0,
      maxTopNgramCharShare: Double = 1.0,
      exactDedup: Boolean = true,
      sampleModulus: Int = 1,
      sampleKeep: Int = 1,
      scrubPii: Boolean = true,
      // opt-in stage 0: unicode repair (NFC + control strip) before any
      // feature is computed — [[TextFunctions.normalizeText]]
      normalize: Boolean = false,
      // opt-in DEFLATE compression-ratio floor
      // ([[TextFunctions.compressionRatio]]): machine-generated
      // boilerplate compresses far below natural prose — drop docs
      // whose ratio falls under the floor. Stateless kernel; streams.
      minCompressRatio: Option[Double] = None,
      // opt-in quality-classifier filter after the cheap filters:
      // logistic over quality features with shipped coefficients
      qualityWeights: Option[Array[Double]] = None,
      minQuality: Double = 0.5,
      // opt-in LEARNED quality-classifier gate ([[QualityClassifier]],
      // the GPT-3/CCNet "similar to reference corpus" filter): keep
      // docs with σ(bias + w·tf) ≥ minClfProb. The heuristic
      // qualityWeights gate above scores FIXED features; this one is
      // trained from labeled positives/negatives. Stateless kernel —
      // streams for free.
      clfModel: Option[QualityClassifier.Model] = None,
      minClfProb: Double = 0.5,
      // opt-in Gopher document-rules gate (Rae et al. 2021 §A1.1,
      // [[TextFunctions.gopherFlags]]): Some(stopwords) enables it with
      // the published thresholds; word-count floor tunable separately
      gopherStopwords: Option[Seq[String]] = None,
      gopherMinWords: Long = 50L,
      // opt-in LM-perplexity gate (CCNet's KenLM stage): keep docs
      // scoring ≤ maxPpl under a caller-trained [[Perplexity.train]]
      // model. The per-row kernel, matching streamingCurate — one
      // stateless map stage, no explode/join.
      perplexityModel: Option[DataFrame] = None,
      maxPpl: Double = Double.MaxValue,
      // opt-in DSIR gate: keep docs whose [[Dsir]] log importance
      // weight under a caller-trained [[Dsir.logRatios]] frame is
      // ≥ minLogWeight ("looks like the target corpus")
      dsirRatios: Option[DataFrame] = None,
      minLogWeight: Double = Double.NegativeInfinity,
      dsirLengthNormalize: Boolean = false)

  /** Returns the curated corpus: `idCol`, `pred_lang`, `n_tokens`,
    * `textCol` (scrubbed when `cfg.scrubPii`).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val text = col(textCol)
    val pre =
      if (cfg.normalize) docs.withColumn(textCol, TextFunctions.normalizeText(text))
      else docs
    val staged0 = pre
      .withColumn("pred_lang", TextFunctions.langId(text))
      .withColumn("n_tokens", TextFunctions.tokenCount(text))
      .withColumn("__rep", TextFunctions.repetitionFeatures(text, 2))
      .filter(col("pred_lang").isin(cfg.langs.toSeq: _*))
      .filter(col("n_tokens").between(cfg.minTokens, cfg.maxTokens))
      .filter(col("__rep.dup_line_frac") <= cfg.maxDupLineFrac &&
        col("__rep.top_ngram_char_share") <= cfg.maxTopNgramCharShare)
    val staged0c = cfg.minCompressRatio.fold(staged0)(floor =>
      staged0.filter(TextFunctions.compressionRatio(text) >= floor))
    val staged1h = cfg.qualityWeights.fold(staged0c)(w =>
      staged0c.filter(TextFunctions.qualityScore(text, w) >= cfg.minQuality))
    val staged1 = cfg.clfModel.fold(staged1h)(m =>
      staged1h.filter(QualityClassifier.prob(text, m) >= cfg.minClfProb))
    val staged2 = cfg.gopherStopwords.fold(staged1)(sw =>
      staged1.filter(TextFunctions.gopherFlags(text,
        minWords = cfg.gopherMinWords, stopwords = sw).getField("pass") === 1L))
    // model-based gates, same kernels and order as streamingCurate:
    // stateless map stages with the bounded model riding as expression
    // constants. Unscorable docs (< 2 tokens) drop at the ppl gate —
    // the streaming gate's null semantics.
    val staged3 = cfg.perplexityModel.fold(staged2) { modelDf =>
      val m = Perplexity.collectModel(modelDf)
      staged2.filter(Perplexity.pplColumn(text, m) <= cfg.maxPpl)
    }
    val staged = cfg.dsirRatios.fold(staged3) { ratiosDf =>
      val r = Dsir.collectRatios(ratiosDf)
      staged3.filter(
        Dsir.weightColumn(text, r, cfg.dsirLengthNormalize) >= cfg.minLogWeight)
    }
      .select(col(idCol), col("pred_lang"), col("n_tokens"), text)
    val deduped =
      if (!cfg.exactDedup) staged
      else Filters.dropDuplicatesKeepFirst(
        staged.withColumn("__fp", TextFunctions.fingerprint(text)),
        cols = Seq("__fp"), orderCols = Seq(idCol)).drop("__fp")
    val sampled =
      if (cfg.sampleModulus <= 1) deduped
      else Sampling.moduloSample(deduped, idCol, cfg.sampleModulus, cfg.sampleKeep)
    val scrubbed =
      if (!cfg.scrubPii) sampled
      else sampled.withColumn(textCol, TextFunctions.redactPii(text))
    scrubbed.select(col(idCol), col("pred_lang"), col("n_tokens"), col(textCol))
  }
}
