package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql` users get the same kernels as the DataFrame API:
  *
  * {{{
  *   GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT vec_dot(embedding, q.qe) FROM ...")
  * }}}
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "vec_norm_sq",
      exprs => FloatVecDot(exprs(0), exprs(0)))
    ColumnBridge.registerFunction(spark, "minhash_sig", {
      case Seq(hashes) => MinHashSig(hashes, 32)
      case Seq(hashes, k) => MinHashSig(hashes, intLit(k, "minhash_sig k"))
      case other => throw new IllegalArgumentException(
        s"minhash_sig(hashes[, k]) takes 1-2 args, got ${other.size}")
    })
    ColumnBridge.registerFunction(spark, "simhash32", {
      case Seq(hashes) => SimHash32(hashes)
      case other => throw new IllegalArgumentException(
        s"simhash32(token_hashes) takes 1 arg, got ${other.size}")
    })
    // custom typed aggregates (Aggregator surface) for spark.sql users;
    // heavy_hitters carries a fixed capacity — SQL functions cannot take
    // a per-call config scalar without a literal-arg builder per k
    import org.apache.spark.sql.{functions => F}
    spark.udf.register("vec_centroid", F.udaf(VectorCentroid,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()))
    spark.udf.register("heavy_hitters",
      F.udaf(HeavyHitters(64), org.apache.spark.sql.Encoders.STRING))
  }
}
