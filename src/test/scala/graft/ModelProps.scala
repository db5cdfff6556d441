package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.core.{Cardinality, TableRef}
import graft.plans.{JoinNode, JoinTree, PlanJson, ScanNode}
import graft.transforms.Transforms

/** Property-based invariants for the plan model (SURVEY §5: the reference
  * has no property tests — these cover the algebraic laws unit examples
  * cannot sweep): join-tree structure, JSON round-trips, cardinality
  * algebra, equality-closure completeness.
  */
object ModelProps extends Properties("graft.model") {

  private val genCard: Gen[Cardinality] = Gen.frequency(
    4 -> Gen.choose(0L, 1000000L).map(Cardinality.of),
    1 -> Gen.const(Cardinality.unknown))

  private val genLeaf: Gen[JoinTree[Cardinality]] = for {
    n <- Gen.choose(0, 7)
    c <- genCard
  } yield ScanNode(TableRef(s"t$n"), c)

  private def genTree(depth: Int): Gen[JoinTree[Cardinality]] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      1 -> genLeaf,
      2 -> (for {
        l <- genTree(depth - 1)
        r <- genTree(depth - 1)
        c <- genCard
      } yield JoinNode(l, r, c)))

  private val trees: Gen[JoinTree[Cardinality]] = genTree(4)

  property("identity map preserves the rendered tree") =
    forAll(trees)(t => t.map(identity).render == t.render)

  property("leaves = joins + 1") =
    forAll(trees)(t => t.tables.size == t.joinCount + 1)

  property("intermediates count = join count") =
    forAll(trees)(t => t.intermediates.size == t.joinCount)

  property("left-deep and right-deep both imply linear") =
    forAll(trees)(t =>
      (!t.isLeftDeep || t.isLinear) && (!t.isRightDeep || t.isLinear))

  property("bushy and zigzag are mutually exclusive") =
    forAll(trees)(t => t.isBushy != t.isZigZag)

  property("PlanJson round-trips arbitrary tree shapes") =
    forAll(trees) { t =>
      PlanJson.fromJson(PlanJson.toJson(t)).render == t.render
    }

  property("cardinality min is commutative and bounded") =
    forAll(Gen.choose(0L, 1000000L), Gen.choose(0L, 1000000L)) { (a, b) =>
      val (ca, cb) = (Cardinality.of(a), Cardinality.of(b))
      ca.min(cb) == cb.min(ca) && ca.min(cb).value <= math.min(a, b).toDouble + 1
    }

  property("unknown is the identity of cardinality min") =
    forAll(Gen.choose(0L, 1000000L)) { a =>
      val c = Cardinality.of(a)
      c.min(Cardinality.unknown) == c && Cardinality.unknown.min(c) == c
    }

  property("equality closure completes a chain to the full clique") =
    forAll(Gen.choose(3, 8)) { n =>
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
      import org.apache.spark.sql.types.IntegerType
      val attrs = (0 until n).map(i => AttributeReference(s"c$i", IntegerType)())
      val chain = attrs.sliding(2).map(p => EqualTo(p(0), p(1))).toSeq
      val extra = Transforms.equalityClosure(chain)
      // chain has n-1 edges; the clique needs n(n-1)/2
      extra.size == n * (n - 1) / 2 - (n - 1)
    }
}
