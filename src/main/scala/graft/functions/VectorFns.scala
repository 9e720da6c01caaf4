package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, computed
  * with higher-order functions (zip_with/aggregate) — codegen'd, no UDF, no
  * shuffle. Cast to double first: float×float products are exact in double
  * and the left-to-right fold is deterministic.
  */
object VectorFns {

  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd dense dot product (see [[DotProduct]]); same left-to-right
    * fold as the HOF formulation, bit-identical results.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(DotProduct(expression(a), expression(b)))
  }

  /** Codegen'd matrix–vector dots: `flat` is a row-major flattened k×d
    * matrix (usually a literal bank); returns the length-k array of row
    * dots. See [[MatVecDots]] for why k separate dot columns don't work.
    */
  def matVecDots(v: Column, flat: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(MatVecDots(expression(v), expression(flat)))
  }

  /** Interpreted HOF formulation, kept as the reference/property check. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from pre-computed norms (precompute once per side of a top-k
    * join instead of per candidate pair).
    */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Deterministic pseudo-random hyperplanes for sign-LSH, from a fixed seed.
    * Returned as plain Scala data so callers can embed them as literals
    * (identical across executors and runs).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the projection). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
