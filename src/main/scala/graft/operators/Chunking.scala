package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window document chunking for context-length-bounded training:
  * split each document into token windows of at most `maxTokens`,
  * advancing by `stride` tokens (stride < maxTokens ⇒ overlapping
  * windows, the usual LM data prep shape; stride == maxTokens ⇒
  * disjoint chunks).
  *
  * Scale shape: a narrow map + generator stage — one `split`, one
  * `explode(sequence(...))`, per-chunk `slice`/`array_join` — no
  * shuffle, no UDF, fully codegen'd around the generator. Output size
  * is input size × overlap factor; at 100 TB that multiplication is the
  * *point* (chunks feed the tokenizer), and because the stage is
  * narrow, it pipelines straight into the downstream sink without ever
  * materializing a doc's chunks together.
  */
object Chunking {

  /** One output row per (doc, window): every non-text input column,
    * `chunk_id` (0-based), the window's text re-joined with single
    * spaces, and its token count (== maxTokens except for each doc's
    * last chunk). Docs with at most `maxTokens` tokens yield exactly
    * one chunk — including empty docs (one empty chunk), so no input
    * row ever vanishes. Metadata columns (lang, source, …) ride along
    * onto every chunk row.
    *
    * Tokens are single-space splits (the repo's whitespace-token
    * convention, [[graft.functions.TextFunctions.tokenCount]]).
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      stride: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens: $maxTokens")
    require(stride > 0 && stride <= maxTokens, s"stride: $stride (need 0 < stride <= maxTokens)")
    require(df.columns.contains(idCol), s"missing id column: $idCol")
    // null text → one empty chunk, not a vanished row (explode of a
    // null sequence would silently drop the doc)
    val toks: Column = split(coalesce(col(textCol), lit("")), " ")
    val n: Column = size(toks)
    // number of windows: 1 + ceil((n - maxTokens) / stride) when the doc
    // overflows a single window; the last window starts within the doc
    val numChunks: Column = when(n <= maxTokens, lit(1L))
      .otherwise(ceil((n - maxTokens).cast("double") / lit(stride.toDouble)).cast("long") + 1L)
    val keep = df.columns.filter(_ != textCol).map(col).toSeq
    val chunk: Column =
      slice(col("__toks"), col("chunk_id").cast("int") * stride + 1, lit(maxTokens))
    df.select((keep :+ toks.as("__toks") :+
        explode(sequence(lit(0L), numChunks - 1L)).as("chunk_id")): _*)
      .select((keep :+ col("chunk_id") :+
        array_join(chunk, " ").as("chunk_text") :+
        size(chunk).cast("long").as("n_tokens")): _*)
  }

  /** Sentence-aware chunking: windows of at most `maxSentences` whole
    * sentences advancing by `stride` — the RAG/embedding prep shape
    * where a chunk must never cut a sentence mid-way. Sentences are
    * maximal runs of non-terminator characters plus their trailing
    * `[.!?]` run (a lookaround-free regex on purpose: Java regex and
    * RE2 — DuckDB, Go — agree on it, so the rule is portable to any
    * oracle engine), trimmed, empties dropped. Same scale shape as
    * [[chunkByTokens]]: narrow map + generator, no shuffle, no UDF;
    * empty/null docs yield one empty chunk so no input row vanishes.
    */
  def chunkBySentences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxSentences: Int,
      stride: Int): DataFrame = {
    require(maxSentences > 0, s"maxSentences: $maxSentences")
    require(stride > 0 && stride <= maxSentences,
      s"stride: $stride (need 0 < stride <= maxSentences)")
    require(df.columns.contains(idCol), s"missing id column: $idCol")
    val sents: Column = filter(
      transform(
        regexp_extract_all(coalesce(col(textCol), lit("")),
          lit("[^.!?]+[.!?]*"), lit(0)),
        s => trim(s)),
      s => s =!= "")
    val n: Column = size(sents)
    val numChunks: Column = when(n <= maxSentences, lit(1L))
      .otherwise(ceil((n - maxSentences).cast("double") / lit(stride.toDouble)).cast("long") + 1L)
    val keep = df.columns.filter(_ != textCol).map(col).toSeq
    val chunk: Column =
      slice(col("__sents"), col("chunk_id").cast("int") * stride + 1, lit(maxSentences))
    df.select((keep :+ sents.as("__sents") :+
        explode(sequence(lit(0L), numChunks - 1L)).as("chunk_id")): _*)
      .select((keep :+ col("chunk_id") :+
        array_join(chunk, " ").as("chunk_text") :+
        size(chunk).cast("long").as("n_sentences")): _*)
  }
}
