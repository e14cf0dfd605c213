package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Versioning seam for the STANDING ASSETS (MinHash band index, near-dup
  * cluster map, IVF index, dhash index): each asset is persisted once per
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
  * Lake posture (round 19): all path handling goes through the Hadoop
  * `FileSystem` API, so the same protocol works on `hdfs://`/`s3a://`
  * paths (the round-18 `java.io.File` form silently always-rebuilt on an
  * object store — correct answers, defeated seam). Publication is
  * write-to-temp-sibling + atomic rename, and the read side requires the
  * committer's `_SUCCESS` marker: a concurrent driver can never observe a
  * partially written asset whose digest stamp still validates — the race
  * that would silently admit duplicates (Round19OpsSpec races two
  * `ensure` calls on one path).
  *
  * Scale posture: [[textDigest]] is one scan-bound aggregation (per-row
  * fingerprint + map-side-combined sum) — cheap next to an index rebuild
  * (shingle explode + k hashes + shuffle), but still a corpus scan; a
  * production lake computes the digest ONCE when a corpus version lands
  * and serves it from the catalog, so probes pay a metadata lookup, not
  * a scan. [[ensure]] is the cache protocol: content-addressed freshness,
  * rebuild on any mismatch, never a TTL. [[advance]] is the maintenance
  * protocol: when the previous corpus version's asset is on hand, the new
  * version's asset derives from it plus the DELTA — linear in the delta
  * (plus one index-grain rewrite), never a corpus-text rescan or an
  * N·√N re-assignment.
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

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())

  /** A published, digest-valid asset at `path`, or None. EVERY failure
    * mode — missing path, missing `_SUCCESS` (a write in flight or a
    * kill mid-commit), unreadable parquet, missing key column, missing
    * or mismatched digest stamp — is a cache miss, never an error: the
    * round-18 form evaluated `df.schema(keyCol)` outside its Try, so a
    * cached asset whose builder output schema changed under an unchanged
    * (digest, tag) key THREW instead of rebuilding, contradicting the
    * documented contract.
    */
  private def readValid(spark: SparkSession, path: String, keyCol: String,
                        digest: Long): Option[DataFrame] =
    scala.util.Try {
      val fs = fsOf(spark, path)
      if (!fs.exists(new Path(path, "_SUCCESS"))) None
      else {
        val df = spark.read.parquet(path)
        val m = df.schema(keyCol).metadata
        if (m.contains(DigestKey) && m.getLong(DigestKey) == digest)
          Some(df)
        else None
      }
    }.toOption.flatten

  /** Publish `asset` at `path` ATOMICALLY: write to a unique temp
    * sibling (Spark's committer leaves `_SUCCESS` there on success),
    * then rename into place via `FileContext.rename(…, Rename.NONE)` —
    * the Hadoop call that FAILS when the destination exists. (Plain
    * `FileSystem.rename` would silently move the temp INSIDE an
    * existing destination directory — nesting the new asset under a
    * stale one.) When two drivers race, exactly one rename wins; the
    * loser discards its temp and serves the winner's (digest-identical)
    * asset. No reader can observe a partial write: the destination
    * appears only by rename, already complete and `_SUCCESS`-marked.
    */
  private def publish(spark: SparkSession, path: String, keyCol: String,
                      digest: Long, asset: DataFrame): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf)
    def writeTmp(): Path = {
      val t = new Path(path + "._tmp-" + java.util.UUID.randomUUID())
      stamp(asset, keyCol, digest).write.parquet(t.toString)
      t
    }
    def place(t: Path): Boolean = {
      fs.mkdirs(dest.getParent)
      val fc = org.apache.hadoop.fs.FileContext
        .getFileContext(dest.toUri, conf)
      try { fc.rename(t, dest, org.apache.hadoop.fs.Options.Rename.NONE)
            true }
      catch { case _: java.io.IOException => fs.delete(t, true); false }
    }
    if (!place(writeTmp())) {
      // lost the race (or a stale/junk asset occupies the path): if what
      // is there now validates, serve it; otherwise clear it and retry
      // once — a second failure is a genuine FS error, surface it
      if (readValid(spark, path, keyCol, digest).isEmpty) {
        fs.delete(dest, true)
        require(place(writeTmp()) ||
            readValid(spark, path, keyCol, digest).nonEmpty,
          s"Assets.publish: cannot place asset at $path")
      }
    }
    spark.read.parquet(path)
  }

  /** Build-once/probe-many: if `path` already holds a PUBLISHED asset
    * stamped with `digest`, read it back (zero build work — this is
    * where the suite's per-query rebuild constant goes away); on a
    * missing, in-flight, unreadable, unstamped, schema-drifted, or stale
    * asset, run `build`, stamp, publish atomically, and serve the REREAD
    * frame (so first call and every later call return the byte-identical
    * parquet-backed plan). Content-addressed freshness: geometry
    * mismatches are caught by the probes' existing metadata guards,
    * digest mismatches here.
    */
  def ensure(spark: SparkSession, path: String, keyCol: String,
             digest: Long)(build: => DataFrame): DataFrame =
    readValid(spark, path, keyCol, digest).getOrElse(
      publish(spark, path, keyCol, digest, build))

  /** Incremental asset maintenance — the round-19 protocol. A corpus
    * moved `oldDigest` → `newDigest` by APPENDING a delta (the admission
    * pipeline's only mutation); the new version's asset should derive
    * from the standing one plus the delta, not from a full rebuild:
    * at 100 TB, [[ensure]]'s rebuild-on-any-mismatch means one new
    * document costs a full shingle pass or an N·√N IVF re-assignment —
    * the exact cost the standing-asset seam exists to avoid.
    *
    * Resolution order:
    *   1. a published `newDigest` asset at `newPath` → serve it
    *      (probe-many; advance already ran);
    *   2. a published `oldDigest` asset at `oldPath` → publish
    *      `advanceFrom(old)` at `newPath` stamped `newDigest` — cost
    *      linear in the delta plus one index-grain rewrite, flat in the
    *      corpus TEXT (the per-family advance functions never touch it);
    *   3. otherwise → `fullBuild` (first landing, or the old asset is
    *      itself missing/stale — advancing from an unverified base would
    *      silently drop every doc the base missed).
    *
    * The advanced asset must be VALUE-IDENTICAL to the from-scratch
    * build on the grown corpus — advance is an optimization, never a
    * semantic fork (the per-family builders guarantee it; Round19OpsSpec
    * and the q276–q279 oracles hold them to from-scratch hashes). The
    * IVF family is the documented exception: a from-scratch build would
    * RESAMPLE centroids, so [[Similarity.advanceIvfIndex]] keeps the old
    * geometry under a drift guard and its query is oracled independently.
    */
  def advance(spark: SparkSession, newPath: String, keyCol: String,
              newDigest: Long, oldPath: String, oldDigest: Long)
             (advanceFrom: DataFrame => DataFrame)
             (fullBuild: => DataFrame): DataFrame =
    readValid(spark, newPath, keyCol, newDigest).getOrElse {
      val built = readValid(spark, oldPath, keyCol, oldDigest)
        .map(advanceFrom).getOrElse(fullBuild)
      publish(spark, newPath, keyCol, newDigest, built)
    }

  /** Deterministic content-addressed path for a driver-run asset: keyed
    * by asset kind + corpus digest + geometry tag, under the JVM temp
    * dir. Digest in the path keeps different corpora (and different SF
    * dirs) from colliding; the tag keys the geometry. The `v2` namespace
    * component is the asset FORMAT version (round 19: `_SUCCESS`-gated
    * atomic publication; also isolates any builder output-schema change
    * from pre-v2 cached assets — the ADVICE schema-drift hazard).
    */
  def assetPath(kind: String, digest: Long, tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-assets/v2/${kind}_${digest}_$tag").getPath
}
