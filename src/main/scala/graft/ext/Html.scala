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

  /** Deterministic markdown augmentation of a document row — the q163
    * discipline: the fixture corpus has no markdown, so both engines
    * rebuild the same doc_id-keyed constructs (heading of varying depth,
    * list items, a fenced code block, inline links) around a text slice;
    * the PARSER below is what's tested, adversarial intent specs live in
    * HtmlSpec.
    */
  def markdownFromDoc: Column =
    concat(
      when(pmod(col("doc_id"), lit(2L)) === 0,
        concat(expr("repeat('#', cast(doc_id % 3 as int) + 1)"),
          lit(" heading\n"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(3L)) === 0, lit("- item a\n- item b\n"))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5L)) === 0,
        concat(lit("```\ncode "), col("doc_id").cast("string"),
          lit("\n```\n"))).otherwise(lit("")),
      substring(col("text"), 1, 50), lit("\n"),
      expr("repeat('[t](u)', cast(doc_id % 4 as int))"))

  /** Markdown structure audit: line-grain construct counts a curation
    * pipeline uses to decide whether a document is prose, a listing, or
    * code-heavy (and to strip or reweight accordingly). Counted per the
    * CommonMark core subset that is decidable line-locally: ATX headings
    * (`^#{1,6} `), dash list items (`^- `), fenced code blocks (paired
    * ``` fence lines), inline `[text](url)` links.
    *
    * Parity envelope: line split on `\n` (both engines keep trailing
    * empties), anchored regexes in the Java ∩ RE2 subset (character
    * classes + bounded repetition, no lookaround). Lazy-continuation,
    * setext headings, indented code blocks are out of contract — this
    * is a structure-signal audit, not a CommonMark parser.
    *
    * Scale shape: pure per-row line/regex work then one source-grain
    * hash aggregation; the line arrays never cross an exchange.
    */
  def markdownAudit(docs: DataFrame, md: Column): DataFrame =
    docs
      .withColumn("__md", md)
      .withColumn("__lines", split(col("__md"), "\n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("__md")).cast("long")).as("md_chars"),
        sum(size(col("__lines")).cast("long")).as("n_lines"),
        sum(expr("size(filter(__lines, x -> x rlike '^#{1,6} '))")
          .cast("long")).as("heading_lines"),
        sum(expr("size(filter(__lines, x -> x = '```')) div 2")
          .cast("long")).as("fenced_blocks"),
        sum(expr("size(filter(__lines, x -> startswith(x, '- ')))")
          .cast("long")).as("list_items"),
        sum(regexp_count(col("__md"), lit("""\[[^\]]*\]\([^)]*\)"""))
          .cast("long")).as("links"))
}
