package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Bloom filter for semi-join reduction — the runtime-filter
  * pattern: build a small bitmap over the join keys of a selective dimension,
  * broadcast it, and drop fact rows that cannot match BEFORE they reach the
  * shuffle. At 100 TB the join's exchange is the dominant cost; a 1%-FPR
  * bitmap over a 1M-key dim is ~1.2 MB and removes the non-matching fact
  * mass map-side, so shuffle volume tracks the MATCHING rows, not the scan.
  * False positives only let extra rows through to the exact join that
  * follows — the final answer is provably identical with or without the
  * filter, which is exactly what the q81 oracle (the plain join) checks.
  *
  * Everything is deterministic and engine-neutral: positions come from
  * `XXH64.hashLong(key, seed_i)` with fixed odd seeds, so the same filter
  * could be rebuilt byte-identically by any XXH64 implementation.
  *
  * Build is fully distributed: each key expands to `numHashes` (word, mask)
  * pairs in-row, a single `groupBy(word).agg(bit_or)` reduces them
  * map-side, and the driver collects AT MOST `numBits/64` words — bounded
  * by the bitmap size chosen up front, never by the data. The bitmap rides
  * a torrent broadcast; the probe is a codegen'd expression referencing it.
  */
object Bloom {

  /** Golden-ratio-derived odd seed for hash i — fixed, engine-neutral. */
  private[graft] def seed(i: Int): Long = 0x9E3779B97F4A7C15L * (2L * i + 1L)

  private[graft] def position(key: Long, i: Int, numBits: Int): Int =
    java.lang.Math.floorMod(XXH64.hashLong(key, seed(i)), numBits.toLong).toInt

  /** Standard sizing: m = -n ln p / (ln 2)^2, rounded up to whole words. */
  def optimalNumBits(expectedKeys: Long, fpp: Double): Int = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val m = math.ceil(-expectedKeys.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2)))
    val words = math.max(1L, math.ceil(m / 64.0).toLong)
    require(words <= (1L << 26), // 512 MB hard cap — past that, partition the dim
      s"bloom of $words words exceeds the single-bitmap cap; shard the build")
    (words * 64L).toInt
  }

  /** k = m/n ln 2, clamped to [1, 8]. */
  def optimalNumHashes(numBits: Int, expectedKeys: Long): Int =
    math.min(8, math.max(1,
      math.round(numBits.toDouble / math.max(1L, expectedKeys) * math.log(2)).toInt))

  /** Distributed build over a single LongType key column. The only driver
    * materialization is the word map (≤ numBits/64 longs).
    */
  def build(keys: DataFrame, key: Column, numBits: Int, numHashes: Int): Array[Long] = {
    require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64")
    val words = numBits / 64
    val pos = column(BloomPositions(expression(key.cast(LongType)), numHashes, numBits))
    val rows = keys
      .select(explode(pos).as("p"))
      .selectExpr("CAST(p / 64 AS INT) AS word",
        "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT)) AS mask")
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](words)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  def buildBroadcast(s: SparkSession, keys: DataFrame, key: Column,
      numBits: Int, numHashes: Int): Broadcast[Array[Long]] =
    s.sparkContext.broadcast(build(keys, key, numBits, numHashes))

  /** Probe column: true iff every hash position is set. Null key → null
    * (dropped by a `=== true` filter, matching inner-join semantics).
    */
  def mightContain(bits: Broadcast[Array[Long]], key: Column, numHashes: Int): Column =
    column(BloomMightContain(expression(key.cast(LongType)), bits, numHashes))
}

/** In-row expansion of a key into its bloom bit positions (array<long>),
  * shared by the build path so build and probe agree by construction.
  */
case class BloomPositions(child: Expression, numHashes: Int, numBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[Long]
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = Bloom.position(key, i, numBits).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k => {
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $arr = new long[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $h = $xxh.hashLong($k, 0x9E3779B97F4A7C15L * (2L * $i + 1L));
         |  $arr[$i] = java.lang.Math.floorMod($h, (long) $numBits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_positions"
}

/** Codegen'd bloom probe. The bitmap rides a `Broadcast` (torrent-
  * distributed once per executor, referenced — not serialized — from the
  * generated code), so the plan stays small no matter how large the
  * filter: the exact discipline the scale-safe LM model follows.
  */
case class BloomMightContain(child: Expression, bits: Broadcast[Array[Long]],
    numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[Long]
    val arr = bits.value
    val numBits = arr.length * 64
    var i = 0
    while (i < numHashes) {
      val p = Bloom.position(key, i, numBits)
      if ((arr(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBits", bits, classOf[Broadcast[Array[Long]]].getName)
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val h = ctx.freshName("h")
    val ok = ctx.freshName("ok")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, k => {
      s"""
         |long[] $arr = (long[]) $bcRef.value();
         |boolean $ok = true;
         |for (int $i = 0; $i < $numHashes && $ok; $i++) {
         |  long $h = $xxh.hashLong($k, 0x9E3779B97F4A7C15L * (2L * $i + 1L));
         |  int $p = (int) java.lang.Math.floorMod($h, (long) ($arr.length * 64));
         |  $ok = ($arr[$p >>> 6] & (1L << ($p & 63))) != 0L;
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}
