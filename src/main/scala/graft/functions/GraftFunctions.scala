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
  }
}
