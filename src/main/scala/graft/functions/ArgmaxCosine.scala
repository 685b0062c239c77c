package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd argmax-cosine centroid assignment: the id of the centroid
  * with the highest cosine similarity to the input vector, ties to the
  * lowest centroid id — bit-identical to the literal-centroid
  * `array_max(array(struct(csim, -cid, cid)*))` formulation it replaces
  * (strict left-to-right double accumulation as [[FloatVecDot]],
  * `denom = vnorm * centNorm` with the same multiply order, zero-denom
  * guard to 0.0, and ascending-cid iteration with strict `>` so the
  * first/lowest id wins ties).
  *
  * Why not literals: embedding k centroids of d floats as `typedLit`s
  * bakes k·d values into the expression tree, so EVERY k-means iteration
  * (and every run — centroids are data-dependent) generates different
  * source and pays a fresh Janino compile; profiling q69 at sf0.1 showed
  * the compile dominating the scan. This kernel reads centroids from
  * `references[...]` objects, so the generated source is identical across
  * iterations and runs and the whole-stage-codegen cache hits.
  *
  * Centroids are sorted by id at construction — the tie-break contract
  * must not depend on caller order.
  */
case class ArgmaxCosine(child: Expression,
                        centroids: Array[(Long, Array[Float])]) extends UnaryExpression {

  require(centroids.nonEmpty, "ArgmaxCosine needs at least one centroid")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmax_cosine requires array<float>, got ${other.sql}")
  }

  @transient private lazy val sorted = centroids.sortBy(_._1)
  @transient private lazy val cents: Array[Array[Float]] = sorted.map(_._2)
  @transient private lazy val cids: Array[Long] = sorted.map(_._1)
  // centroid norms folded on the driver, same left-to-right double
  // accumulation as the literal form's `ce.foreach(x => sq += x*x)`
  @transient private lazy val norms: Array[Double] = cents.map { ce =>
    var sq = 0.0
    ce.foreach(x => sq += x.toDouble * x.toDouble)
    math.sqrt(sq)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var vs = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      vs += x * x
      i += 1
    }
    val vnorm = math.sqrt(vs)
    var bestS = Double.NegativeInfinity
    var best = 0L
    var k = 0
    while (k < cents.length) {
      val ce = cents(k)
      val m = math.min(n, ce.length)
      var acc = 0.0
      var j = 0
      while (j < m) {
        acc += arr.getFloat(j).toDouble * ce(j).toDouble
        j += 1
      }
      val denom = vnorm * norms(k)
      val s = if (denom == 0.0) 0.0 else acc / denom
      if (s > bestS) { bestS = s; best = cids(k) }
      k += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // all centroid data behind references[...]: no value-dependent
      // constant reaches the generated source, so the codegen cache hits
      // across iterations/runs
      val cRef = ctx.addReferenceObj("argmaxCents", cents, "float[][]")
      val idRef = ctx.addReferenceObj("argmaxIds", cids, "long[]")
      val nmRef = ctx.addReferenceObj("argmaxNorms", norms, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val vs = ctx.freshName("vs")
      val vnorm = ctx.freshName("vnorm")
      val bestS = ctx.freshName("bestS")
      val best = ctx.freshName("best")
      val ce = ctx.freshName("ce")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val denom = ctx.freshName("denom")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |int $n = $arr.numElements();
         |double $vs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $arr.getFloat($i);
         |  $vs += $x * $x;
         |}
         |double $vnorm = java.lang.Math.sqrt($vs);
         |double $bestS = java.lang.Double.NEGATIVE_INFINITY;
         |long $best = 0L;
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  float[] $ce = $cRef[$k];
         |  int $m = java.lang.Math.min($n, $ce.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $acc += ((double) $arr.getFloat($j)) * ((double) $ce[$j]);
         |  }
         |  double $denom = $vnorm * $nmRef[$k];
         |  double $s = ($denom == 0.0) ? 0.0 : $acc / $denom;
         |  if ($s > $bestS) { $bestS = $s; $best = $idRef[$k]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  // the case-class defaults compare the centroids Array by REFERENCE,
  // so two semantically identical expressions would never be equal —
  // defeating Catalyst canonicalization, subexpression elimination, and
  // plan-level reuse. Compare (and hash) the contents.
  override def equals(other: Any): Boolean = other match {
    case a: ArgmaxCosine =>
      child == a.child && centroids.length == a.centroids.length &&
        centroids.indices.forall { i =>
          centroids(i)._1 == a.centroids(i)._1 &&
            java.util.Arrays.equals(centroids(i)._2, a.centroids(i)._2)
        }
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    centroids.foreach { case (id, v) =>
      h = 31 * h + java.lang.Long.hashCode(id)
      h = 31 * h + java.util.Arrays.hashCode(v)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxCosine =
    copy(child = newChild)
}
