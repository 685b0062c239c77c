package graft

import java.nio.file.{Files, Paths}
import graft.streaming.CdcStream
import graft.operators.Multimodal

/** Dev drive: the streaming CDC pipeline + multimodal featurize through the
  * public API, as an application would use them. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("streamdemo").toString
    val in = s"$base/in"; val lake = s"$base/lake"; val err = s"$base/err"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))

    def put(name: String, lines: String*): Unit =
      Files.write(Paths.get(in, name), lines.mkString("\n").getBytes)

    put("f1.json",
      """{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310602.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Architect"}}}}""")
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)
    println("RUN1 lake rows: " + spark.read.json(s"$lake/year=*/month=*/day=*/hour=*").count())

    put("f2.json",
      // the MODIFY row carries an attribute with an EMPTY type map ("junk")
      // - must be omitted from the flattened row (reference semantics), not
      // crash the batch under ANSI mode
      """{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1687310722.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Developer Advocate"},"junk":{}}}}""",
      """{"eventName":"BOGUS","dynamodb":{"ApproximateCreationDateTime":1687310800.0,"Keys":{},"NewImage":{}}}""",
      """not json at all""")
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)
    val lakeDf = spark.read.json(s"$lake/year=*/month=*/day=*/hour=*")
    println("RUN2 lake rows (expect 2, exactly-once): " + lakeDf.count())
    println("lake files:")
    Files.walk(Paths.get(lake)).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .forEachRemaining(p => if (p.toString.endsWith(".json.gz")) println("  " + p.toString.stripPrefix(base)))
    lakeDf.orderBy("ingestion_timestamp").show(false)
    println("error rows by reason:")
    spark.read.json(err).groupBy("error_reason").count().show(false)

    val media = Multimodal.syntheticMedia(spark, 10)
    val feats = Multimodal.featurize(media, dim = 4)
    println("multimodal featurize:")
    feats.orderBy("media_id").show(3, false)
    spark.stop()
  }
}
