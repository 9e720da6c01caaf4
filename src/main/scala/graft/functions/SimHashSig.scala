package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Shared-arithmetic token hash for SimHash: a polynomial roll over code
  * points followed by two multiply-mod-xorshift mixing streams, every
  * intermediate bounded below 2^63 so the SAME computation runs in any
  * engine with plain 64-bit integer SQL (no wrapping multiplication
  * needed). This is what makes the d4 oracle possible: DuckDB replicates
  * the hash bit-for-bit with list_reduce/xor/shifts, so the simhash
  * signatures — and therefore the candidate pairs and Hamming distances —
  * are engine-independent facts, not implementation details.
  *
  * Spec (M = 1125899906842597, the largest prime < 2^50; H0 a fixed
  * ~2^49.4 seed so the FIRST multiply already wraps mod M — without it,
  * short tokens produce small polynomials, the mod never bites, and the
  * "hash" bits stay linearly correlated across similar tokens):
  *   h0 = fold(code points, init H0): h = (h * 131 + code) % M
  *   mix(h, m): x = (h*m) % M; x = x XOR (x >> 25); x = (x*m) % M;
  *              x = x XOR (x >> 25)
  *   h1 = mix(h0, 8191); h2 = mix(h0, 4099)
  *   token bit j = bit j of h1 for j < 32, bit (j-32) of h2 otherwise.
  * Bounds: h < 2^50, multipliers < 2^13 → products < 2^63 (exact in
  * signed 64-bit); xorshift keeps values < 2^50.
  */
object SimHashTokenHash {
  val M = 1125899906842597L
  val H0 = 741103597153329L
  final def mix(h0: Long, m: Long): Long = {
    var x = (h0 * m) % M
    x = x ^ (x >>> 25)
    x = (x * m) % M
    x ^ (x >>> 25)
  }
  /** The raw polynomial roll (pre-mix) — also the shared token→bucket
    * hash for feature hashing (d40): engine-independent by the same
    * bounds argument.
    */
  final def poly(s: String): Long = {
    var h = H0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131 + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  /** (h1, h2) bit-source pair for a token. ASCII-safe; non-ASCII uses code
    * points on both engines.
    */
  final def tokenHash(s: String): (Long, Long) = {
    val h = poly(s)
    (mix(h, 8191L), mix(h, 4099L))
  }
}

/** 64-bit SimHash over a token array in a single loop: each token's
  * [[SimHashTokenHash]] bits vote ±1 per position; bits with positive sums
  * are set. Bit-identical to the HOF formulation (property-tested) and to
  * the DuckDB oracle replica.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val (h1, h2) = SimHashTokenHash.tokenHash(arr.getUTF8String(j).toString)
      var b = 0
      while (b < 32) {
        if (((h1 >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        if (((h2 >> b) & 1L) == 1L) counts(b + 32) += 1 else counts(b + 32) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}
