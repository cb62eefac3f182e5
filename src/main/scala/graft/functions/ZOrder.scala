package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column data skipping.
  *
  * Sorting/range-partitioning a table by the interleaved bits of two
  * columns clusters BOTH dimensions at once: each file's min/max spans
  * ~sqrt(files) of each dimension's domain rather than all of it, so a
  * parquet reader's row-group/file pruning works for predicates on
  * either column — the layout lever behind "skip 95% of a 100 TB table
  * on either filter column". A single-column sort gives perfect pruning
  * on that column and none on the other; Z-order trades a constant
  * factor on the first for coverage of both (see ZOrderSpec for the
  * measured file-bounds contrast).
  *
  * Pure bit arithmetic on longs (shift/and/or chains — codegen'd,
  * engine-exact, no UDF).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit i of `x` lands at bit 2i, bit i of `y` at bit 2i+1. With
    * bits ≤ 31 the result fits comfortably in a long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    val parts =
      (0 until bits).map(i =>
        shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)) ++
      (0 until bits).map(i =>
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    parts.reduce(_ bitwiseOR _)
  }

  /** The same interleave as DuckDB SQL (for oracle mirrors). */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")
    val parts =
      (0 until bits).map(i => s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    parts.mkString("(", " | ", ")")
  }
}
