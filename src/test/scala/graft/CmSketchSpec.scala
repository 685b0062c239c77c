package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** Count-Min guarantees: estimates NEVER underestimate (every counter a
  * key touches holds its true count plus non-negative collision mass),
  * tighten as width grows, and are exact when width dwarfs the key space. */
class CmSketchSpec extends SparkSpec {
  import spark.implicits._

  private def freqs(n: Int, keys: Int) = {
    val rnd = new scala.util.Random(3)
    (1 to n).map(_ => s"k${rnd.nextInt(keys)}").toDF("k")
  }

  test("never underestimates, for every key") {
    val df = freqs(5000, 300)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val sketch = Sketch.countMin(df, "k", depth = 4, width = 64)
    val est = Sketch.cmEstimates(sketch, exact.select("k"), "k",
      depth = 4, width = 64)
    val bad = exact.join(est, "k").filter($"cm_est" < $"exact").count()
    assert(bad === 0L, "a Count-Min estimate fell below the true count")
  }

  test("exact when width dwarfs the key space") {
    val df = freqs(2000, 20)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val sketch = Sketch.countMin(df, "k", depth = 4, width = 4096)
    val est = Sketch.cmEstimates(sketch, exact.select("k"), "k",
      depth = 4, width = 4096)
    val off = exact.join(est, "k").filter($"cm_est" =!= $"exact").count()
    assert(off === 0L, "collision-free sketch should be exact")
  }

  test("sketch size is depth x width rows regardless of input size") {
    val small = Sketch.countMin(freqs(100, 50), "k", depth = 4, width = 32)
    val large = Sketch.countMin(freqs(20000, 5000), "k", depth = 4, width = 32)
    assert(small.count() <= 4 * 32 && large.count() <= 4 * 32)
  }
}
