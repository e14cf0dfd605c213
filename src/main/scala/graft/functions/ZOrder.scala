package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: bit-interleaving two dimension keys so
  * that sorting by the single z-value co-locates rows that are close in
  * BOTH dimensions — the layout trick behind multi-dimensional data
  * skipping (Delta OPTIMIZE ZORDER BY, Iceberg sort orders): per-file
  * min/max ranges become narrow in every interleaved dimension at once, so
  * selective filters on either column prune files.
  *
  * Pure integer shift/mask arithmetic (codegen'd, engine-neutral — the
  * DuckDB oracle computes the identical expression), never a UDF.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b` (odd
    * positions) into a single long. Inputs are masked to `bits` first, so
    * callers can pass raw keys.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      (shiftrightunsigned(am, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftrightunsigned(bm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }
}
