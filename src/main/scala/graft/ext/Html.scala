package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform a crawl pipeline applies
  * before ANY text-quality work (every downstream signal — token counts,
  * dedup shingles, language ID — is poisoned if markup leaks through):
  * script/style blocks and comments are dropped WITH their contents,
  * remaining tags are dropped keeping their contents, the five core
  * character entities are decoded, and whitespace is collapsed.
  *
  * Parity envelope: every step is a regex both Java and RE2 execute with
  * identical leftmost-first spans — character classes, lazy `.*?`
  * quantifiers, alternation; no lookaround, no dotall flag (crawl text
  * here is newline-free; a newline-tolerant variant would add `(?s)`,
  * which both engines support but whose DuckDB option-flag mapping is
  * deliberately kept out of the oracle contract). Entity decode order is
  * load-bearing: `&amp;` decodes LAST so `&amp;lt;` yields the literal
  * `&lt;` rather than double-decoding — the standard single-pass rule.
  * This is the pragmatic regex subset, not an HTML5 parser: CDATA,
  * conditional comments, unquoted `>` inside attribute values are out of
  * contract (the same documented envelope as the URL canonicalizer).
  *
  * Scale shape: pure per-row codegen'd regex chain, zero shuffles until
  * the caller's rollup.
  */
object Html {

  /** Extracted visible text of an HTML string (see object doc). */
  def htmlToText(h: Column): Column = {
    val noScript = regexp_replace(h, "<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // decode &amp; LAST: single-pass entity semantics
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Per-source extraction scorecard: raw vs extracted char mass, markup
    * element count, and entity count — the boilerplate-mass readout that
    * decides whether a source is text or markup soup.
    *
    * @return source, n_docs, raw_chars, text_chars, n_tags, n_entities
    */
  def extractionScorecard(docs: DataFrame, html: Column): DataFrame =
    docs
      .withColumn("__text", htmlToText(html))
      .withColumn("__raw_len", length(html).cast("long"))
      .withColumn("__text_len", length(col("__text")).cast("long"))
      .withColumn("__tags",
        regexp_count(html, lit("<[^>]+>")).cast("long"))
      .withColumn("__ents",
        regexp_count(html, lit("&(amp|lt|gt|quot|#39);")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__raw_len")).as("raw_chars"),
        sum(col("__text_len")).as("text_chars"),
        sum(col("__tags")).as("n_tags"),
        sum(col("__ents")).as("n_entities"))
}
