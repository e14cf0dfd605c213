package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Versioning seam for the STANDING ASSETS (MinHash band index, near-dup
  * cluster map, IVF index): each asset is persisted once per
  * (corpus digest, geometry) and probed many times — the build-once/
  * probe-many shape a 100 TB lake actually runs, where re-deriving an
  * index per query would re-scan petabytes.
  *
  * The version key is the q222 lineage digest (order-invariant content
  * hash — partitioning, file order, and shuffle layout cannot change it),
  * folded to ONE long per corpus. It rides in the asset's key-column
  * METADATA (the [[Dedup.buildBandIndex]] geometry discipline — Spark
  * persists field metadata through parquet), so a reloaded asset still
  * carries its provenance and a probe against a STALE asset fails loudly
  * instead of silently answering from last week's corpus — the silent
  * failure mode this seam exists to prevent: a near-dup gate probing a
  * stale index ADMITS every duplicate of a doc that arrived since the
  * index was built.
  *
  * Scale posture: [[textDigest]] is one scan-bound aggregation (per-row
  * fingerprint + map-side-combined sum) — cheap next to an index rebuild
  * (shingle explode + k hashes + shuffle), but still a corpus scan; a
  * production lake computes the digest ONCE when a corpus version lands
  * and serves it from the catalog, so probes pay a metadata lookup, not
  * a scan. [[ensure]] is the cache protocol: content-addressed freshness,
  * rebuild on any mismatch, never a TTL.
  */
object Assets {
  /** Metadata key carrying the corpus digest an asset was built from. */
  val DigestKey = "corpus_digest"

  /** ONE order-invariant long for a documents corpus: the q222 per-doc
    * terms (non-linear mix of content fingerprint + doc identity — see
    * [[Curation.corpusDigest]] for why the mix must precede the
    * commutative sum) summed across ALL sources mod 2³¹.
    */
  def textDigest(docs: DataFrame): Long =
    Curation.digestTerms(docs)
      .agg(coalesce(pmod(sum(col("term")), lit(1L << 31)), lit(0L)))
      .head().getLong(0)

  /** Stamp `digest` into `keyCol`'s metadata, PRESERVING the geometry
    * metadata the builders already wrote (k/bands/n/minJaccard).
    */
  def stamp(asset: DataFrame, keyCol: String, digest: Long): DataFrame = {
    val merged = new MetadataBuilder()
      .withMetadata(asset.schema(keyCol).metadata)
      .putLong(DigestKey, digest).build()
    asset.withColumn(keyCol, col(keyCol).as(keyCol, merged))
  }

  /** Loud freshness gate: the asset must carry [[DigestKey]] metadata
    * (absent = unverifiable = error, the round-17 geometry discipline)
    * and it must equal the corpus digest the caller holds.
    */
  def requireFresh(asset: DataFrame, keyCol: String, digest: Long)
      : DataFrame = {
    val meta = asset.schema(keyCol).metadata
    require(meta.contains(DigestKey),
      s"asset column '$keyCol' carries no '$DigestKey' metadata — build " +
        "it through a Versioned builder (or Assets.stamp); an unstamped " +
        "asset cannot be validated against the corpus")
    require(meta.getLong(DigestKey) == digest,
      s"STALE asset: built at $DigestKey=${meta.getLong(DigestKey)}, the " +
        s"corpus is now at $digest — rebuild the asset (Assets.ensure " +
        "rebuilds on mismatch automatically)")
    asset
  }

  /** Build-once/probe-many: if `path` already holds an asset stamped with
    * `digest`, read it back (zero build work — this is where the suite's
    * per-query rebuild constant goes away); on a missing, unreadable,
    * unstamped, or stale asset, run `build`, stamp, persist, and serve
    * the REREAD frame (so first call and every later call return the
    * byte-identical parquet-backed plan). Content-addressed freshness:
    * geometry mismatches are caught by the probes' existing metadata
    * guards, digest mismatches here.
    */
  def ensure(spark: SparkSession, path: String, keyCol: String,
             digest: Long)(build: => DataFrame): DataFrame = {
    val existing =
      if (!new java.io.File(path).exists()) None
      else scala.util.Try(spark.read.parquet(path)).toOption
        .filter { df =>
          val m = df.schema(keyCol).metadata
          m.contains(DigestKey) && m.getLong(DigestKey) == digest
        }
    existing.getOrElse {
      stamp(build, keyCol, digest).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }

  /** Deterministic content-addressed path for a driver-run asset: keyed
    * by asset kind + corpus digest + geometry tag, under the JVM temp
    * dir. Digest in the path keeps different corpora (and different SF
    * dirs) from colliding; the tag keys the geometry.
    */
  def assetPath(kind: String, digest: Long, tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-assets/${kind}_${digest}_$tag").getPath
}
