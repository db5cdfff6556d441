package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Cardinality, JoinOperator, TableRef}
import graft.plans._

class PlanJsonSpec extends AnyFunSuite {

  private def randomTree(rnd: scala.util.Random, tables: List[String]): JoinTree[Cardinality] =
    tables match {
      case t :: Nil => ScanNode(TableRef(t), Cardinality(rnd.nextInt(1000).toDouble))
      case ts =>
        val split = 1 + rnd.nextInt(ts.size - 1)
        val (l, r) = ts.splitAt(split)
        JoinNode(randomTree(rnd, l), randomTree(rnd, r),
          Cardinality(rnd.nextInt(100000).toDouble))
    }

  test("join trees round-trip through JSON (random shapes)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(7)
      val tree = randomTree(rnd, (0 until n).map(i => s"t$i").toList)
      val back = PlanJson.fromJson(PlanJson.toJson(tree))
      assert(back === tree)
    }
  }

  test("unknown cardinalities survive the round trip as unknown") {
    val t = JoinTree.leftDeep(Seq("a", "b").map(TableRef(_)))
    val back = PlanJson.fromJson(PlanJson.toJson(t))
    assert(back.annotation.isUnknown)
  }

  test("operator assignments round-trip through JSON") {
    val ops = PhysicalOperatorAssignment(
      joinOperators = Map(
        Set("a", "b") -> JoinOperator.HashJoin,
        Set("a", "b", "c") -> JoinOperator.BroadcastHashJoin),
      disabledJoinOps = Set(JoinOperator.NestedLoopJoin),
      defaultJoin = Some(JoinOperator.SortMergeJoin))
    val back = PlanJson.operatorsFromJson(PlanJson.operatorsToJson(ops))
    assert(back.joinOperators === ops.joinOperators)
    assert(back.disabledJoinOps === ops.disabledJoinOps)
    assert(back.defaultJoin === ops.defaultJoin)
  }

  test("plan parameterizations round-trip through JSON") {
    val p = graft.plans.PlanParameterization(
      cardinalityHints = Map(
        Set("a", "b") -> Cardinality.of(42),
        Set("c") -> Cardinality.unknown),
      parallelWorkers = Some(16),
      sessionConfigs = Map("spark.sql.adaptive.enabled" -> "false"))
    val back = PlanJson.parametersFromJson(PlanJson.parametersToJson(p))
    assert(back.cardinalityHints(Set("a", "b")) === Cardinality.of(42))
    assert(back.cardinalityHints(Set("c")).isUnknown)
    assert(back.parallelWorkers === Some(16))
    assert(back.sessionConfigs === p.sessionConfigs)
  }
}
