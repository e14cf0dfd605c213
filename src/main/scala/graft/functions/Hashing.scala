package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-neutral deterministic hashes, pinned in ONE place on the Scala
  * side. Every DuckDB oracle carries the same literal arithmetic — a
  * constant tweak here without the matching oracle change (or vice versa)
  * is a correctness bug, so the definition must not be re-rolled inline at
  * call sites.
  *
  * Spark's native hashes (Murmur3 `hash`, `xxhash64`) are faster but not
  * reproducible outside Spark; these are used wherever an assignment (split
  * membership, sample selection, centroid choice, sketch hashing) must be
  * verifiable by an external engine.
  */
object Hashing {

  /** Knuth multiplicative hash: ((x + offset) · 2654435761) mod `mod`. */
  def knuthMod(x: Column, mod: Long, offset: Long = 0L): Column =
    pmod((x + lit(offset)) * lit(2654435761L), lit(mod))

  /** Affine spreading step: (x · 2654435761 + 1013904223) mod `mod` — a
    * bijection on [0, mod) for odd multiplier and mod a power of two, used
    * to spread range-limited hash inputs across the full space (the KMV
    * estimator requires uniformity on [0, mod)).
    */
  def spread(x: Column, mod: Long): Column =
    pmod(x * lit(2654435761L) + lit(1013904223L), lit(mod))

  /** The q136 two-round xorshift mix into [0, 2⁴⁰) — the NON-affine hash
    * for observables a linear map corrupts: trailing-zero geometrics
    * (HLL), sorted-order adjacency (shuffle audits — an affine key has
    * three-distance structure), span-draw lattices, and pairing-swap
    * sensitivity in additive digests. xor/shift replay engine-neutrally
    * (DuckDB `xor()` / `// 2^k`). Input envelope |x| ≲ 3.4e9 (the shared
    * affine-hash long envelope — larger inputs overflow the multiply).
    */
  def mix40(x: Column): Column =
    mixTail40(pmod(x * lit(2654435761L) + lit(1013904223L), lit(1L << 40)))

  /** Rounds 2–4 of [[mix40]] (xorshift → fold-multiply → xorshift) for
    * callers that seed the first affine round differently (shuffleQuality
    * folds the epoch into it). ONE definition of the constants — the
    * SQL-fragment twins must change in lockstep with this.
    */
  def mixTail40(h1: Column): Column = {
    val h2 = h1.bitwiseXOR(shiftright(h1, 20))
    val h3 = pmod(pmod(h2, lit(1L << 32)) * lit(1540483477L) + lit(99991L),
      lit(1L << 40))
    h3.bitwiseXOR(shiftright(h3, 17))
  }
}
