package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only: prove the custom expressions run inside generated code, not
  * the interpreted fallback. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val df = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorFunctions.dot(col("embedding"), col("qe")).as("dp"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("FloatVecDot in generated code: " + gen.contains("getFloat"))
    println("WholeStageCodegen subtrees: " + gen.linesIterator.count(_.contains("WholeStageCodegen")))
    df.count() // force execution; codegen compile errors would fall back + warn

    val sigs = Tables.documents(spark, d)
      .select(col("doc_id"), graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), graft.operators.TextAnalysis.shingles(col("toks"), 3).as("sh"))
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))
    val gen2 = org.apache.spark.sql.execution.debug.codegenString(sigs.queryExecution.executedPlan)
    println("MinHashSig in generated code: " + gen2.contains("minhashAs"))
    sigs.count()
    println("both kernels executed without codegen fallback warnings above")
    spark.stop()
  }
}
