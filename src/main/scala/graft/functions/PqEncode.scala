package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd product-quantization encoder: subspace `s` of the input
  * vector gets the index of the codebook seed whose slice minimizes
  * squared L2 distance, ties to the lowest index — bit-identical to the
  * literal `array(array_min(array(struct(dist, j)*)).getField("j")*)`
  * formulation it replaces: strict left-to-right double accumulation over
  * exactly-widened floats, and `array_min`'s struct ordering on the
  * distance field (NaN sorts largest, a null distance sorts smallest).
  * A null slice ELEMENT nulls every seed's distance for that subspace —
  * struct tie, lowest j wins — so the subspace encodes to 0; the kernel
  * reproduces that. A null VECTOR encodes to [0, ..., 0] in the literal
  * form (never null); [[graft.operators.Similarity.pqEncode]] preserves
  * that by coalescing this (null-propagating) kernel with the zero-codes
  * literal.
  *
  * Why not literals: at m=8 subspaces × k=16 seeds × 8 dims the literal
  * form bakes ~3,200 expression nodes into ONE projection. Fused into a
  * downstream stage (the ADC join + aggregate under the full-column write
  * path) the generated `hashAgg_doAggregateWithKeys` method exceeds
  * Janino's 64 KB limit and the WHOLE stage silently falls back to
  * interpreted execution on every run (two `CodeGenerator: Failed to
  * compile ... Code grows beyond 64 KB` errors per Verify pass — round-16
  * optimization finding, guide §4). This kernel keeps the codebook behind
  * `references[...]`: the generated source is one method call, identical
  * across runs, so whole-stage codegen compiles and its class cache hits.
  */
case class PqEncode(child: Expression,
                    seeds: Array[Array[Float]], m: Int) extends UnaryExpression {

  require(seeds.nonEmpty, "PqEncode needs at least one seed")
  private val dim = seeds.head.length
  require(seeds.forall(_.length == dim), "ragged seeds")
  require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${other.sql}")
  }

  /** Spark's nan-safe double compare (NaN largest, NaN == NaN) — the
    * ordering `array_min` applies to the struct's distance field. */
  private def ltNanSafe(x: Double, y: Double): Boolean = {
    if (java.lang.Double.isNaN(x)) false
    else if (java.lang.Double.isNaN(y)) true
    else x < y
  }

  /** The whole encode as one reusable method — interpreted eval and the
    * generated code both call it, so interpreted == codegen by
    * construction. */
  def encode(arr: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    val sub = dim / m
    var s = 0
    while (s < m) {
      val base = s * sub
      // a null element anywhere in the slice nulls every seed's distance
      // -> struct tie -> code 0 (exactly the literal form)
      var sliceNull = arr.numElements() < base + sub
      var i = 0
      while (!sliceNull && i < sub) {
        if (arr.isNullAt(base + i)) sliceNull = true
        i += 1
      }
      if (!sliceNull) {
        var bestD = 0.0
        var bestJ = -1
        var j = 0
        while (j < seeds.length) {
          val seed = seeds(j)
          var d = 0.0
          var i2 = 0
          while (i2 < sub) {
            val diff = arr.getFloat(base + i2).toDouble - seed(base + i2).toDouble
            d += diff * diff
            i2 += 1
          }
          if (bestJ < 0 || ltNanSafe(d, bestD)) { bestD = d; bestJ = j }
          j += 1
        }
        codes(s) = bestJ
      }
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $self.encode($arr);"
    })

  // the case-class defaults compare the seeds Array by REFERENCE, so two
  // semantically identical expressions would never be equal — defeating
  // Catalyst canonicalization, subexpression elimination, and plan-level
  // reuse. Compare (and hash) the contents.
  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      child == p.child && m == p.m && seeds.length == p.seeds.length &&
        seeds.indices.forall(i => java.util.Arrays.equals(seeds(i), p.seeds(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = 31 * child.hashCode() + m
    seeds.foreach(v => h = 31 * h + java.util.Arrays.hashCode(v))
    h
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
