package graft

import org.apache.spark.sql.types._

/** Dtype-parity gate for the driver's hash compare, inside `sbt test`.
  *
  * The driver hashes pandas frames: an oracle column DuckDB promotes to
  * HUGEINT comes back float64 while Spark writes BIGINT, and the hash
  * fails on `29409.0` vs `29409` even when every value is equal. That
  * trap shipped three times (q134/q139 round 5, q278 round 8) because
  * nothing JVM-side could see the oracle's output types.
  *
  * The bridge is `tools/oracle_kinds.json`: `tools/check_oracle.py
  * --emit-kinds` records, per query, each ORACLE output column's pandas
  * dtype collapsed to the kind class the hash is sensitive to
  * (int / float / bool / datetime / obj — int32 vs int64 hashes the
  * same, int vs float does not). This spec replays that manifest
  * against the SPARK schema of all declared queries — schema resolution
  * is analysis-only, so the whole inventory checks in seconds. A new or
  * edited query must re-run the python rig (which is itself
  * kind-strict) to refresh the manifest, so an un-cast oracle can no
  * longer ship green.
  */
class OracleDtypeParitySpec extends SparkSpec {

  private def kindOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType                        => "float"
    case BooleanType                                   => "bool"
    case DateType | TimestampType | TimestampNTZType   => "datetime"
    case _: DecimalType                                => "decimal" // never green: driver hash sees Decimal objects
    case _                                             => "obj"
  }

  /** col -> (oracle kind, oracle column contained NULLs). */
  private lazy val manifest: Map[String, Map[String, (String, Boolean)]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File("tools/oracle_kinds.json"))
    import scala.jdk.CollectionConverters._
    root.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala
        .map(c => c.getKey ->
          (c.getValue.get("kind").asText(), c.getValue.get("nulls").asBoolean()))
        .toMap
    }.toMap
  }

  /** pandas promotes nullable int64 -> float64 and nullable bool ->
    * object on BOTH frames whenever the values match, so these pairs
    * hash green at the driver; anything else (esp. no-null float vs
    * int = the HUGEINT trap) is drift. */
  private def compatible(oracle: (String, Boolean), spark: String): Boolean =
    oracle._1 == spark ||
      (oracle._2 && ((oracle._1 == "float" && spark == "int") ||
                     (oracle._1 == "obj" && spark == "bool")))

  test("manifest covers the full declared inventory") {
    val declared = SparkEntry.oracleSql.keySet
    val recorded = manifest.keySet
    assert(declared -- recorded === Set.empty[String],
      s"queries missing from tools/oracle_kinds.json — re-run " +
        s"`python3 tools/check_oracle.py <sf> <out> --emit-kinds tools/oracle_kinds.json`")
  }

  test("every query's Spark schema kinds match the oracle's recorded kinds") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1);
         kinds <- manifest.get(name)) {
      val schema = fn(spark, sf0001).schema
      val sparkKinds = schema.fields.map(f => f.name -> kindOf(f.dataType)).toMap
      if (sparkKinds.keySet != kinds.keySet)
        bad += s"$name: columns differ spark=${sparkKinds.keySet.toSeq.sorted} oracle=${kinds.keySet.toSeq.sorted}"
      else {
        val diff = kinds.keys.filterNot(c => compatible(kinds(c), sparkKinds(c)))
          .map(c => s"$c oracle=${kinds(c)} spark=${sparkKinds(c)}")
        if (diff.nonEmpty) bad += s"$name: ${diff.mkString(", ")}"
      }
    }
    assert(bad.isEmpty, s"dtype-kind drift (driver hash would fail):\n${bad.mkString("\n")}")
  }
}
