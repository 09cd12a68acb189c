package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural completeness of PlanAudit's default run (r11 VERDICT #2).
  * The r10 rot class was a hand-kept default list that silently stopped
  * short; the fix is derivation — there is no list to extend — plus a
  * loud orphan check for check keys that name no registered query. */
class PlanAuditRegistrySpec extends AnyFunSuite {

  test("default audit list IS the query registry, sorted") {
    val d = graft.examples.PlanAudit.defaultNames
    assert(d.toSet === SparkEntry.queries.keySet,
      "every registered query must be in the default audit run")
    assert(d === d.sorted, "deterministic (sorted) audit order")
    assert(d.size === SparkEntry.queries.size, "no duplicates")
  }

  test("a deliberately-orphaned check key is detected") {
    val real = SparkEntry.queries.keys.head
    assert(graft.examples.PlanAudit.orphanedChecks(Set(real)).isEmpty)
    assert(graft.examples.PlanAudit.orphanedChecks(
      Set(real, "q999_does_not_exist")) === Set("q999_does_not_exist"),
      "an orphaned check key must surface, not rot silently")
  }
}
