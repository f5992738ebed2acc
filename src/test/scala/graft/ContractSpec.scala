package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: every declared query must be fully
  * oracle-checkable, and every oracle must carry a total ORDER BY — a
  * missing one is the classic silent hash-mismatch (the driver compares
  * rows in order).
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("every oracle SQL ends in a total ORDER BY") {
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("query names follow the qNN_snake convention and are sequential") {
    val names = SparkEntry.queries.keySet
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    val nums = names.map(_.takeWhile(_ != '_').drop(1).toInt)
    assert(nums == (1 to names.size).toSet, "query numbering has gaps or duplicates")
  }
}
