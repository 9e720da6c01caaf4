package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Bound-pruned IVF argmax assignment as ONE codegen'd expression — the
  * whole-operator form of the SemDeDup/IVF nearest-centroid step: for
  * an input vector v (`array<double>`, dimension `dim`), return the
  * cent_id of the argmax-cosine fine centroid, ties to the lowest id —
  * bit-identical to the relational broadcast-join + max_by(struct(sim,
  * −id)) formulation (NaN ordered greatest via Double.compare, the same
  * total order Spark's struct max uses; sims are the same left-to-right
  * dot fold over the same doubles).
  *
  * The centroid bank rides as PLAIN ARRAYS on the expression (reference
  * objects in generated code, not literal children): `flatFine` is the
  * K×dim fine bank in cent_id-ascending order with `fineIds` /
  * `fineNorms` / `fineCell` / `fineD` aligned to it (fineD = distance
  * of the unit fine centroid to its cell's unit mean), `flatCells` the
  * K'×dim UNIT cell means with `rads` their radii. Per row: K' cell
  * cosines give lb = max(csim_g − rad_g); a fine centroid's 64-wide dot
  * runs ONLY if csim_{cell(f)} + fineD(f) ≥ lb − ε (the per-centroid
  * triangle bound — any f with cosine ≥ lb passes its own bound, so the
  * true argmax and every tie survive; ε = 1e-9 absorbs double rounding,
  * over-wide survival costs work, never the winner).
  *
  * Why an Expression and not the relational plan: the survivor logic in
  * Column algebra needs per-row HOF lambdas (interpreted — measured
  * ~40 s of struct-building at N = 200k, dwarfing the dots it saved) or
  * an explode + broadcast join (shuffles the vector column per
  * candidate). Here the whole decision is one primitive loop in
  * whole-stage codegen: work per row is K'·dim + K + |survivors|·dim
  * multiply-adds, no allocation beyond the generated locals.
  */
case class IvfAssignExpr(child: Expression, flatFine: Array[Double],
    fineIds: Array[Long], fineNorms: Array[Double], fineCell: Array[Int],
    fineD: Array[Double], flatCells: Array[Double], rads: Array[Double],
    dim: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  private def kFine = fineIds.length
  private def kCells = rads.length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      v(i) = x.getDouble(i)
      i += 1
    }
    var s2 = 0.0
    i = 0
    while (i < dim) { s2 += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(s2)
    val csims = new Array[Double](kCells)
    var lb = Double.NegativeInfinity
    var g = 0
    while (g < kCells) {
      var s = 0.0
      i = 0
      while (i < dim) { s += v(i) * flatCells(g * dim + i); i += 1 }
      csims(g) = s / nrm
      val cand = csims(g) - rads(g)
      if (cand > lb) lb = cand
      g += 1
    }
    var best = Double.NaN
    var bestId = Long.MaxValue
    var any = false
    var f = 0
    while (f < kFine) {
      if (csims(fineCell(f)) + fineD(f) >= lb - 1e-9) {
        var s = 0.0
        i = 0
        while (i < dim) { s += v(i) * flatFine(f * dim + i); i += 1 }
        val sim = s / (nrm * fineNorms(f))
        if (!any || java.lang.Double.compare(sim, best) > 0
            || (java.lang.Double.compare(sim, best) == 0 && fineIds(f) < bestId)) {
          best = sim; bestId = fineIds(f); any = true
        }
      }
      f += 1
    }
    if (!any) null else bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ff = ctx.addReferenceObj("flatFine", flatFine, "double[]")
    val ids = ctx.addReferenceObj("fineIds", fineIds, "long[]")
    val fn = ctx.addReferenceObj("fineNorms", fineNorms, "double[]")
    val fc = ctx.addReferenceObj("fineCell", fineCell, "int[]")
    val fd = ctx.addReferenceObj("fineD", fineD, "double[]")
    val cc = ctx.addReferenceObj("flatCells", flatCells, "double[]")
    val rr = ctx.addReferenceObj("rads", rads, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val f = ctx.freshName("f")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val csims = ctx.freshName("csims")
      val lb = ctx.freshName("lb")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val any = ctx.freshName("any")
      val bad = ctx.freshName("bad")
      val sim = ctx.freshName("sim")
      val cmp = ctx.freshName("cmp")
      s"""
         |if ($a.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  double[] $v = new double[$dim];
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $dim && !$bad; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; }
         |    else { $v[$i] = $a.getDouble($i); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) { $s += $v[$i] * $v[$i]; }
         |    double $nrm = java.lang.Math.sqrt($s);
         |    double[] $csims = new double[${kCells}];
         |    double $lb = Double.NEGATIVE_INFINITY;
         |    for (int $g = 0; $g < ${kCells}; $g++) {
         |      $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) { $s += $v[$i] * $cc[$g * $dim + $i]; }
         |      $csims[$g] = $s / $nrm;
         |      if ($csims[$g] - $rr[$g] > $lb) { $lb = $csims[$g] - $rr[$g]; }
         |    }
         |    double $best = Double.NaN;
         |    long $bestId = Long.MAX_VALUE;
         |    boolean $any = false;
         |    for (int $f = 0; $f < ${kFine}; $f++) {
         |      if ($csims[$fc[$f]] + $fd[$f] >= $lb - 1e-9) {
         |        $s = 0.0;
         |        for (int $i = 0; $i < $dim; $i++) { $s += $v[$i] * $ff[$f * $dim + $i]; }
         |        double $sim = $s / ($nrm * $fn[$f]);
         |        int $cmp = java.lang.Double.compare($sim, $best);
         |        if (!$any || $cmp > 0 || ($cmp == 0 && $ids[$f] < $bestId)) {
         |          $best = $sim; $bestId = $ids[$f]; $any = true;
         |        }
         |      }
         |    }
         |    if (!$any) { ${ev.isNull} = true; } else { ${ev.value} = $bestId; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_ivf_assign"
}
