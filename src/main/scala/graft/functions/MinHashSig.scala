package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single tight loop: for each shingle, `numHashes`
  * seeded xxhash64 values; each signature slot keeps the minimum. Exactly the
  * hash chain of the Column formulation `xxhash64(lit(i), shingle)` (seed 42
  * → hashLong(i) → hashUnsafeBytes(shingle)), so signatures are identical to
  * the HOF version — property-tested. The per-seed first link is
  * shingle-independent and precomputed once.
  *
  * Interpreted (CodegenFallback): the work is the hashing itself; removing
  * the per-element higher-order-function machinery is the win (~3× on the
  * LSH dedup path).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // First chain link matches `xxhash64(lit(i), s)` where i came from
  // `sequence(0, n-1)` — an IntegerType element, hence hash-as-int.
  @transient private lazy val seedChain: Array[Long] =
    Array.tabulate(numHashes)(i =>
      XxHash64Function.hash(i, org.apache.spark.sql.types.IntegerType, 42L))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, org.apache.spark.sql.types.StringType,
          seedChain(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
