package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract around SparkEntry: every gate query must carry a
  * DuckDB oracle (a missing oracle silently downgrades that row to a
  * weaker rows-only check), no oracle may dangle without a query, and
  * the per-package maps must not shadow each other's keys (the maps are
  * merged with ++, so a duplicate key would silently drop one side's
  * query — a gate that "passes" while testing the wrong code).
  */
class GateContractSpec extends AnyFunSuite {

  test("every gate query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    // pinned to the actual registered count (update when adding queries):
    // a silent shrink — a dropped map entry, a shadowed key — must fail CI,
    // not just lower a generous floor
    assert(q.size >= 202, s"gate shrank to ${q.size} queries (floor 202)")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle for $k")
    }
  }

  test("the per-package query maps never shadow each other") {
    val parts = Seq(
      "Relational" -> Relational.queries.keySet,
      "LlmQueries" -> LlmQueries.queries.keySet,
      "OptQueries" -> OptQueries.queries.keySet)
    for {
      (na, a) <- parts; (nb, b) <- parts if na < nb
    } assert((a & b).isEmpty, s"$na and $nb both define: ${(a & b).toSeq.sorted}")
  }
}
