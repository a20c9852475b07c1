package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity — pure checks, no Spark session.
  *
  * QuerySpec.toMaps builds Maps, where a duplicate name would silently
  * DROP a query (last wins) and its correctness coverage with it; and a
  * query registered without oracle SQL silently downgrades to the
  * driver's weaker rows-only check. Both must be loud, deliberate
  * decisions, not accidents of registration.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries that are rows-only BY DESIGN, with the reason on record.
    * Currently empty: even the HLL sketch query is oracle-checked via its
    * error-envelope contract (exact count hash-compared + tolerance flag).
    */
  private val rowsOnlyByDesign = Set.empty[String]

  test("query names are globally unique (a duplicate would silently drop one)") {
    val names = SparkEntry.specs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("every query has oracle SQL unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnlyByDesign,
      s"queries without an oracle (add SQL or document here): " +
        (missing -- rowsOnlyByDesign).mkString(", "))
  }

  test("the flagship entry query is registered") {
    assert(SparkEntry.queries.contains("cdc_restore_replay"))
  }
}
