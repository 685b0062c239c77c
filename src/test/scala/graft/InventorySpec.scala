package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-consistency of the declared inventory: the driver's t2 gate
  * hash-checks every `queries` entry against `oracleSql`, so a query
  * accidentally shipped without an oracle (or with a clashing name)
  * silently weakens the gate — fail CI instead. */
class InventorySpec extends AnyFunSuite {

  test("every declared query has an oracle and a unique well-formed name") {
    val inv = Queries.inventory
    assert(inv.nonEmpty)
    val names = inv.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d+[a-z0-9_]*")), s"bad names: ${names.filterNot(_.matches("q\\d+[a-z0-9_]*"))}")
    // The driver contract allows omitting the oracle for ops that are not
    // reasonably SQL-expressible (it then records a weaker rows-only
    // check). That must stay an EXPLICIT decision: any query without an
    // oracle must be on this list with its spec-based validation.
    // Currently EMPTY — every declared query is oracle-checked (q69's
    // Lloyd's iterations unrolled into a DuckDB CTE chain in round 3).
    val rowsOnlyAllowed = Set.empty[String]
    val missing = inv.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(rowsOnlyAllowed)
    assert(missing.isEmpty, s"queries without oracle SQL not allowlisted: $missing")
    assert(SparkEntry.queries.keySet -- rowsOnlyAllowed === SparkEntry.oracleSql.keySet)
    assert(inv.size >= 166)
  }

  test("oracle SQL is driver-serializable (no control chars beyond newline/tab)") {
    for (q <- Queries.inventory; sql <- q.oracle) {
      val bad = sql.filter(c => c < ' ' && c != '\n' && c != '\t')
      assert(bad.isEmpty, s"${q.name} oracle contains control chars: ${bad.map(_.toInt)}")
    }
  }
}
