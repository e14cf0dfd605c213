package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Safety / compliance operators a large-scale training-data pipeline runs
  * before anything reaches a trainer (round 9; joins the curation family —
  * cf. the pre-training filtering passes described in the C4 and RefinedWeb
  * papers):
  *
  *  - PII scan + redaction: regex detection of emails / phone numbers / IP
  *    addresses, counted per document and replaced with typed placeholder
  *    tags. At lake scale this is the pass that runs FIRST (compliance
  *    gates every downstream copy), so its shape matters: pure per-row
  *    projections, zero shuffles until the final rollup.
  *  - Blocklist filtering: the C4-style "bad-words" pass — a document is
  *    dropped when blocklisted tokens exceed a share of its length. The
  *    keep/drop decision is an exact integer inequality
  *    (`blocked·100 ≤ pct·total`), never a floating-point ratio, so the
  *    decision is reproducible bit-for-bit across engines.
  *
  * Scale notes: both operators are per-row expression pipelines over one
  * corpus scan (codegen'd regex / array kernels, no UDFs, no joins); the
  * per-(lang, source) rollups are standard partial-aggregated hash
  * aggregations whose result cardinality is the tiny (lang × source) grid.
  * The blocklist itself is a compile-time literal array — at 100 TB a real
  * blocklist (10k words) would move into a broadcast set probed via
  * array_intersect against the same token arrays; the plan shape is
  * unchanged.
  */
object Safety {

  /** Production-shaped PII patterns (round 10 — the round-9 versions only
    * matched the synthetic corpus's own shapes, which would clear a real
    * crawl): general email (mixed case, dot/plus/percent local parts, any
    * alphabetic TLD), NANP phone in its common writings (`+1` prefix,
    * parenthesized area code, `-`/`.`/space separators, 3-3-4 digits), and
    * any dotted-quad IP. Confined to the Java ∩ RE2 common subset so both
    * engines agree on every match boundary — character classes, bounded
    * repetition, non-capturing groups; no backreferences, no lookaround,
    * no case-insensitivity flags (case lives in the classes). Both engines
    * are leftmost-first with greedy quantifiers, so spans are identical.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "(?:\\+1[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
  val IpRe    = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Per-document PII signals over `text`: match counts per PII kind and
    * the redacted text (typed placeholders, IP → phone → email order so a
    * placeholder can never partially re-match a later pattern).
    *
    * One projection, zero shuffles; every added column is a codegen'd
    * regexp kernel over the already-loaded string.
    */
  def piiScan(docs: DataFrame, text: Column): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(text, lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(text, lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(text, lit(IpRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(text, IpRe, "<IP>"),
            PhoneRe, "<PHONE>"),
          EmailRe, "<EMAIL>"))

  /** Corpus-level PII scorecard: per source, how many documents carry PII,
    * how many of each kind, and the redacted corpus size. The rollup an
    * auditor reads before clearing a crawl for training.
    */
  def piiScorecard(docs: DataFrame, text: Column): DataFrame =
    piiScan(docs, text)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_phones") + col("n_ips") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_phones")).as("n_phones"),
        sum(col("n_ips")).as("n_ips"),
        sum(length(col("redacted")).cast("long")).as("redacted_chars"))

  /** Per-document blocklist signals: token count, blocklisted-token count,
    * and the keep decision `blocked·100 ≤ maxPct·total` (empty documents
    * are kept — zero blocked tokens). Exact integers end to end. Matching
    * is NORMALIZED the way C4's bad-words pass normalizes: tokens are
    * ASCII-case-folded and stripped of leading/trailing punctuation before
    * the probe ("Bad" and "bad." both hit a `bad` entry), while `n_tokens`
    * still counts raw whitespace tokens — see
    * [[graft.functions.BlocklistCounts]] for the exact contract.
    */
  def blocklistScan(docs: DataFrame, text: Column, blockWords: Seq[String],
                    maxPct: Int): DataFrame = {
    // one-pass codegen'd kernel: tokenize once, O(1) hash-set probe per
    // token (the HOF form's array_contains is O(|blocklist|) per token —
    // fatal at a production 10k-word list; FunctionsSpec asserts parity)
    docs
      .withColumn("__bc",
        graft.functions.BlocklistCounts.countsCol(text, blockWords))
      .withColumn("n_tokens", element_at(col("__bc"), 1))
      .withColumn("n_blocked", element_at(col("__bc"), 2))
      .withColumn("kept",
        col("n_blocked") * 100 <= lit(maxPct.toLong) * col("n_tokens"))
      .drop("__bc")
  }

  /** Blocklist rollup per (lang, source): document and token totals on both
    * sides of the filter — the numbers that decide whether a source is
    * worth crawling at all.
    */
  def blocklistScorecard(docs: DataFrame, text: Column,
                         blockWords: Seq[String], maxPct: Int): DataFrame =
    blocklistScan(docs, text, blockWords, maxPct)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_blocked")).as("blocked_tokens"),
        sum(col("n_tokens")).as("total_tokens"))

  /** Luhn checksum sum of a 16-digit candidate string: digits at odd
    * left-positions (2nd, 4th, … counting from the RIGHT of a 16-char
    * string) are doubled with digit-sum reduction (2d > 9 ⇒ 2d − 9), the
    * rest pass through; a candidate is a valid PAN shape iff the sum is
    * ≡ 0 (mod 10). Pure integer expression arithmetic — 16 unrolled
    * terms, no UDF, engine-exact.
    */
  private def luhnSum(c: Column): Column =
    (1 to 16).map { i =>
      val d = (ascii(substring(c, i, 1)) - lit(48)).cast("long")
      if (i % 2 == 1) {
        val t = d * 2
        when(t > 9, t - 9).otherwise(t)
      } else d
    }.reduce(_ + _)

  /** Per-document payment-card (PAN) signals: 16-digit candidate runs and
    * the subset passing the Luhn checksum — the checksum is what separates
    * a real card number from an arbitrary digit run, so counting only
    * regex matches (the q163 pattern style) would drown a compliance
    * readout in order-id false positives. Candidates are contiguous
    * 16-digit runs; spaced/dashed writings (`4111 1111 …`) would need a
    * separator-tolerant pattern plus a strip before the checksum — same
    * machinery, wider envelope (documented out of contract here).
    *
    * Zero shuffles: one codegen'd regex extraction + an O(16) integer
    * fold per candidate.
    */
  def panScan(docs: DataFrame, text: Column): DataFrame =
    docs
      .withColumn("__cands",
        regexp_extract_all(text, lit("[0-9]{16}"), lit(0)))
      .withColumn("n_pans", size(col("__cands")).cast("long"))
      .withColumn("n_valid",
        size(filter(col("__cands"), c => luhnSum(c) % 10 === 0)).cast("long"))
      .drop("__cands")

  /** Corpus-level PAN scorecard per source: documents carrying a
    * Luhn-valid card-shaped number vs mere 16-digit runs — the
    * false-positive split a compliance pass reports before redaction.
    */
  def panScorecard(docs: DataFrame, text: Column): DataFrame =
    panScan(docs, text)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_valid") > 0, 1L).otherwise(0L))
          .as("docs_with_valid_pan"),
        sum(col("n_pans")).as("n_pans"),
        sum(col("n_valid")).as("n_valid_pans"))

  /** k-anonymity with one-step hierarchy generalization (Sweeney 2002,
    * "k-Anonymity: a model for protecting privacy"): rows whose
    * quasi-identifier pair occurs ≥ k times release the pair intact
    * (level 0); rows in smaller groups generalize the finer identifier to
    * `*` and re-test at the coarser grain (level 1); rows still below k
    * are suppressed entirely and reported only as one census row
    * (level 2, both identifiers `*`-ed, null key). Alongside each
    * released group: its size and the distinct count of the sensitive
    * attribute — the l-diversity readout (a k-anonymous group with ONE
    * sensitive value still leaks it to anyone who can place a person in
    * the group).
    *
    * Scale shape: the group-size frames are quasi-identifier-cardinality
    * (tiny vs the data; broadcast back onto the rows), so the data makes
    * exactly two passes — tag, then aggregate per released grain. The
    * distinct-sensitive counts run per group grain, map-side partially
    * aggregated; nothing global except the one suppressed census row.
    * Decisions are pure integer compares — engine-exact.
    *
    * @return (quasi1 nullable, quasi2 `*`-generalized string, n_records,
    *         n_distinct_sensitive, level 0|1|2); the level-2 row is
    *         omitted when nothing is suppressed
    */
  def kAnonymize(df: DataFrame, quasi1: Column, quasi2: Column,
                 sensitive: Column, k: Int): DataFrame = {
    val rows = df.select(quasi1.cast("long").as("quasi1"),
      quasi2.cast("string").as("quasi2"), sensitive.as("sens"))
    val g0 = rows.groupBy(col("quasi1"), col("quasi2"))
      .agg(count(lit(1)).as("n"))
    val tagged = rows.join(broadcast(g0), Seq("quasi1", "quasi2"))
    val lvl0 = tagged.filter(col("n") >= k)
      .groupBy(col("quasi1"), col("quasi2"))
      .agg(count(lit(1)).as("n_records"),
        count_distinct(col("sens")).as("n_distinct_sensitive"))
      .select(col("quasi1"), col("quasi2"), col("n_records"),
        col("n_distinct_sensitive"), lit(0L).as("level"))
    val small = tagged.filter(col("n") < k)
    val g1 = small.groupBy(col("quasi1")).agg(count(lit(1)).as("n1"))
    val tagged1 = small.drop("n").join(broadcast(g1), Seq("quasi1"))
    val lvl1 = tagged1.filter(col("n1") >= k)
      .groupBy(col("quasi1"))
      .agg(count(lit(1)).as("n_records"),
        count_distinct(col("sens")).as("n_distinct_sensitive"))
      .select(col("quasi1"), lit("*").as("quasi2"), col("n_records"),
        col("n_distinct_sensitive"), lit(1L).as("level"))
    val suppressed = tagged1.filter(col("n1") < k)
      .agg(count(lit(1)).as("n_records"),
        count_distinct(col("sens")).as("n_distinct_sensitive"))
      .filter(col("n_records") > 0L)
      .select(lit(null).cast("long").as("quasi1"), lit("*").as("quasi2"),
        col("n_records"), col("n_distinct_sensitive"), lit(2L).as("level"))
    lvl0.unionByName(lvl1).unionByName(suppressed)
  }

  /** Consistent pseudonymization audit: every distinct email entity maps
    * to a deterministic surrogate (`user_<fp mod 10^6>`, the
    * engine-neutral fingerprint), so the SAME address redacts to the SAME
    * token in every document — the property that keeps coreference usable
    * after redaction (plain `<EMAIL>` masking destroys it), and the map
    * needs no lookup table: the surrogate is a pure function of the
    * entity, so executors never coordinate.
    *
    * The readout is the audit a privacy review runs over the mapping:
    * per surrogate, mention and document counts, and `n_entities` — the
    * number of DISTINCT raw addresses sharing that surrogate. Anything
    * above 1 is a fingerprint collision (two people merged under one
    * pseudonym — acceptable for training text, but it must be measured,
    * not assumed zero).
    *
    * Scale shape: extraction is per-row regexp; the rollup shuffles once
    * on the surrogate key with map-side combine; distinct-entity counting
    * rides the same exchange (entity grain first, then surrogate grain).
    *
    * @return surrogate, n_mentions, n_docs, n_entities
    */
  def pseudonymize(docs: DataFrame, text: Column): DataFrame = {
    val mentions = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(text, lit(EmailRe), lit(0))).as("email"))
    val perEntity = mentions
      .groupBy(col("email"))
      .agg(count(lit(1)).as("n_mentions"),
        count_distinct(col("doc_id")).as("n_docs"))
      .withColumn("surrogate",
        concat(lit("user_"),
          pmod(TextStats.fingerprint(col("email")), lit(1000000L))
            .cast("string")))
    perEntity.groupBy(col("surrogate"))
      .agg(sum(col("n_mentions")).as("n_mentions"),
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_entities"))
  }

  /** Right-to-be-forgotten audit (tombstone propagation): given a delete
    * request table of entities (emails), find every document MENTIONING
    * a deleted entity — those documents must be dropped or re-redacted
    * in the next corpus build, and the audit quantifies the blast radius
    * per source BEFORE the deletion job runs. This is document-level
    * removal driven by entity linkage — a different operation from span
    * redaction ([[piiScan]]): deletion requests name a person, not a
    * span, and every co-occurring document is affected.
    *
    * Scale shape: mention extraction is per-row regexp; the delete set
    * is a broadcast semi-join probe (request tables are human-scale, ≪
    * corpus); the per-doc flag collapses in one doc-grain aggregate and
    * the readout is source-cardinality. The corpus is touched once.
    *
    * @return source, n_docs, n_tombstoned, chars_purged,
    *         n_deleted_mentions
    */
  def forgetAudit(docs: DataFrame, text: Column,
                  deleteList: DataFrame): DataFrame = {
    val mentions = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(text, lit(EmailRe), lit(0)))
          .as("email"))
      .join(broadcast(deleteList.select(col("email")).distinct()), "email")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_del_mentions"))
    docs.select(col("doc_id"), col("source"),
        length(text).cast("long").as("nc"))
      .join(mentions, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_del_mentions").isNotNull, 1L).otherwise(0L))
          .as("n_tombstoned"),
        sum(when(col("n_del_mentions").isNotNull, col("nc")).otherwise(0L))
          .as("chars_purged"),
        coalesce(sum(col("n_del_mentions")), lit(0L))
          .as("n_deleted_mentions"))
  }
}
