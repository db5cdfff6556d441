package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Cardinality, TableRef}
import graft.plans.{JoinNode, JoinTree, ScanNode}

class ModelSpec extends AnyFunSuite {

  test("cardinality algebra: unknown propagates, min ignores unknown") {
    assert((Cardinality.unknown + Cardinality.of(5)).isUnknown)
    assert(Cardinality.unknown.min(Cardinality.of(5)) === Cardinality.of(5))
    assert(Cardinality.of(3).min(Cardinality.of(5)) === Cardinality.of(3))
    assert(Cardinality.infinite.isInfinite)
    assert(!Cardinality.of(7).isUnknown)
  }

  private def scan(n: String) = ScanNode(TableRef(n), Cardinality.unknown)
  private def join(a: JoinTree[Cardinality], b: JoinTree[Cardinality]) =
    JoinNode(a, b, Cardinality.unknown)

  test("left-deep construction and shape classification") {
    val t = JoinTree.leftDeep(Seq("a", "b", "c", "d").map(TableRef(_)))
    assert(t.isLeftDeep); assert(t.isLinear); assert(!t.isBushy)
    assert(t.tables.map(_.identifier) === Seq("a", "b", "c", "d"))
    assert(t.joinCount === 3)
  }

  test("bushy trees are detected") {
    val bushy = join(join(scan("a"), scan("b")), join(scan("c"), scan("d")))
    assert(bushy.isBushy); assert(!bushy.isLeftDeep); assert(!bushy.isZigZag)
  }

  test("zigzag trees are linear but not left-deep") {
    val zig = join(scan("c"), join(join(scan("a"), scan("b")), scan("d")))
    assert(zig.isZigZag)
    assert(!zig.isLeftDeep)
  }

  test("intermediates enumerate join-node table sets bottom-up") {
    val t = JoinTree.leftDeep(Seq("a", "b", "c").map(TableRef(_)))
    assert(t.intermediates === Seq(Set("a", "b"), Set("a", "b", "c")))
  }

  // property-style: random table orders round-trip through leftDeep
  test("leftDeep preserves arbitrary table orders") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 2 + rnd.nextInt(8)
      val ns = rnd.shuffle((0 until n).map(i => s"t$i").toList)
      val t = JoinTree.leftDeep(ns.map(TableRef(_)))
      assert(t.tables.map(_.identifier) === ns)
      assert(t.isLeftDeep)
    }
  }
}
