package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data clustering —
  * the layout operator behind "cluster this 100 TB table so filters on
  * EITHER of two columns skip most files". Interleaving the bits of two
  * range-bucketized dimensions gives a 1-D sort key whose contiguous
  * ranges are small rectangles in (a, b) space: range-partition + sort
  * by the z-value and every parquet file carries narrow min/max stats on
  * BOTH source columns, so row-group pruning (and file skipping in
  * manifest formats) works for predicates on either dimension — unlike a
  * plain sort, which buys locality on the leading column only.
  *
  * Built entirely from codegen'd bitwise built-ins (shiftleft / & / |)
  * via the classic magic-number bit spread — no UDF, no custom
  * expression, and the same arithmetic is replayable in ANSI SQL, which
  * is how the q70 oracle pins it (the DuckDB replay unrolls the same
  * four spread stages).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i:
    * 0x0000abcd -> a.b.c.d interleaved with zeros. Stage masks are the
    * standard Morton magic numbers.
    */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value of two 16-bit dimensions: a's bits at even
    * positions, b's at odd. Callers bucketize wider domains into
    * [0, 65535] first (rank, hash, or modulo — q70 uses modulo so the
    * oracle can replay it closed-form).
    */
  def zValue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
