package graft

import scala.sys.process._

import graft.operators.TxLog

/** Cross-process optimistic-concurrency evidence for the TxLog
  * (round-9 directive #3): the generation claim is create-exclusive on
  * the filesystem, which same-JVM specs prove only for racing THREADS.
  * A real deployment's rival writer is a separate Spark application —
  * so this spec spawns a SECOND JVM ([[TxLogRaceProbe]], same classpath,
  * its own SparkSession) appending to the same zone while this JVM
  * appends concurrently, then asserts total serialization: every commit
  * from both writers landed exactly once, the generation line is gapless
  * and fully resolvable, and the committed row stats stayed exact. */
class TxLogRaceSpec extends SparkSpec {
  import spark.implicits._

  // build.sbt's forked-JVM module opens, mirrored for the child (a bare
  // `java` launch of Spark on JDK17 needs them)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two PROCESSES racing appends serialize: no lost generation, no torn head") {
    val perWriter = 12
    val zone = java.nio.file.Files
      .createTempDirectory("graft_race").toString + "/zone"
    // seed generation 0 so both writers append to an existing log; the
    // tracked stats column propagates to every append (zone's committed
    // choice), making assert #3's metadata count exact
    TxLog.replace(spark, zone, Seq(("seed", -1)).toDF("writer", "i"),
      statsCols = Seq("writer"))
    val seedGen = TxLog.latest(spark, zone).get.gen

    // child writer: a second JVM on this test's classpath (Test/fork is
    // on, so java.class.path is the real suite classpath)
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.TxLogRaceProbe", zone, "child", perWriter.toString)
    val childOut = new StringBuilder
    val child = Process(cmd).run(ProcessLogger(
      line => childOut.synchronized { childOut.append(line).append('\n') }: Unit,
      _ => ()))

    // parent writer: race on this JVM's session while the child runs
    for (i <- 0 until perWriter)
      TxLog.append(spark, zone, Seq(("parent", i)).toDF("writer", "i"),
        maxRetries = 50)

    assert(child.exitValue() === 0,
      s"child writer JVM failed; output:\n$childOut")
    assert(childOut.toString.contains(s"race-probe done child $perWriter"),
      s"child did not report success:\n$childOut")

    // 1. every row from both writers landed exactly once
    val rows = TxLog.read(spark, zone).as[(String, Int)].collect().toSeq
    val expected = Seq(("seed", -1)) ++
      (0 until perWriter).map(("parent", _)) ++
      (0 until perWriter).map(("child", _))
    assert(rows.sorted === expected.sorted,
      "both writers' commits must land exactly once — no lost update")

    // 2. the generation line is gapless and every generation resolves
    //    (serialization evidence: each of the 2×perWriter appends claimed
    //    exactly the next number after the seed, none skipped or torn)
    val head = TxLog.latest(spark, zone).get
    assert(head.gen === seedGen + 2L * perWriter,
      s"head must be generation ${seedGen + 2 * perWriter}, got ${head.gen}")
    for (g <- 0L to head.gen)
      assert(TxLog.snapshotAt(spark, zone, g).isDefined,
        s"generation $g must resolve — a torn or lost commit broke the chain")

    // 3. committed per-file stats stayed exact under the race
    assert(TxLog.metadataCount(spark, zone) === Some(expected.size.toLong),
      "metadata row count must equal the true row count")
  }
}
