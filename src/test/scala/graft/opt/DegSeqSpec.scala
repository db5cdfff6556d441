package graft.opt

import org.scalatest.funsuite.AnyFunSuite

/** Pure-level regression tests for the degree-sequence state algebra
  * (UesBoundModel companion): the r15 ADVICE soundness findings. The
  * state invariant is PREFIX domination (majorization), not rank-wise
  * domination — degProd of two envelopes majorizes the true sorted
  * products but can sit below them at individual ranks, so any
  * rank-wise composition (the pre-r16 degMin, a per-degree cap) can
  * undercut the truth once a later step prices the sequence. */
class DegSeqSpec extends AnyFunSuite {
  import UesBoundModel.{degPairSum, degProd, degScale, degMassCap}
  import org.scalactic.Tolerance._

  private def expand(s: IndexedSeq[(Double, Double)]): Seq[Double] =
    s.flatMap { case (d, n) => Seq.fill(math.round(n).toInt)(d) }
  private def prefixes(xs: Seq[Double]): Seq[Double] =
    xs.scanLeft(0.0)(_ + _).tail
  private def dominates(a: Seq[Double], t: Seq[Double]): Boolean = {
    val pa = prefixes(a.padTo(t.size, 0.0))
    val pt = prefixes(t)
    pa.zip(pt).forall { case (x, y) => x >= y - 1e-9 }
  }

  test("degProd output majorizes anti-aligned true products but is " +
      "NOT a rank-wise envelope (why degMin had to go)") {
    // dL = [3,1] and dc = [3,1] are exact envelopes of two columns whose
    // degrees anti-align across values: true joined products are [3,3].
    val dL = IndexedSeq((3.0, 1.0), (1.0, 1.0))
    val dc = IndexedSeq((3.0, 1.0), (1.0, 1.0))
    val prod = expand(degProd(dL, dc, Double.PositiveInfinity))
    val truth = Seq(3.0, 3.0)
    assert(dominates(prod, truth), s"prefix domination lost: $prod")
    // rank 2 of the envelope (1.0) sits BELOW the truth (3.0): rank-wise
    // operations on this sequence are unsound
    assert(prod(1) < truth(1))
  }

  test("the pre-r16 rank-wise min undercuts a later step's pricing; " +
      "the alpha-scaled base alone does not") {
    // Envelope [7,1,1] majorizes truth [3,3,3] (prefixes 7,8,9 >= 3,6,9)
    // — the shape a degProd can produce. The alpha-scaled base [3,3,3]
    // is rank-wise sound. Their rank-wise min [3,1,1] majorizes NEITHER
    // (prefix 5 < 6): pricing the next step with it undercounts.
    val envelope = IndexedSeq((7.0, 1.0), (1.0, 2.0))
    val alphaBase = IndexedSeq((3.0, 3.0))
    val partner = IndexedSeq((2.0, 3.0)) // next step's true base sequence
    val trueSum = Seq(3.0, 3.0, 3.0).zip(Seq(2.0, 2.0, 2.0))
      .map { case (a, b) => a * b }.sum // 18
    assert(degPairSum(envelope, 9.0, partner) >= trueSum)
    assert(degPairSum(alphaBase, 9.0, partner) >= trueSum)
    val oldMin = IndexedSeq((3.0, 1.0), (1.0, 2.0)) // rank-wise min
    assert(degPairSum(oldMin, 9.0, partner) < trueSum,
      "the removed degMin composition would have undercounted here")
  }

  test("degMassCap clips prefix sums at the bound without touching " +
      "early ranks, preserving the rank count") {
    val s = IndexedSeq((10.0, 2.0), (4.0, 3.0)) // mass 32, 5 ranks
    val capped = degMassCap(s, 25.0)
    // the clip carries 1e-6 multiplicative headroom (ulp-soundness at
    // exact-equality caps), so the clipped mass sits just above the cap
    assert(capped.map { case (d, n) => d * n }.sum === 25.0 +- 1e-3)
    assert(capped.map(_._2).sum === 5.0 +- 1e-6)
    assert(expand(capped).take(2) === Seq(10.0, 10.0)) // early ranks intact
    // a cap at/above the total mass is the identity
    assert(degMassCap(s, 32.0) === s)
    assert(degMassCap(s, 1e9) === s)
  }

  test("degScale keeps prefix domination under the mass cap for truth " +
      "spread across late ranks (per-degree capping would not, at " +
      "sub-mass caps)") {
    // envelope [10, 0] majorizes truth [5, 5]; scaling by 2 with the
    // new-bound cap 20 (= the scaled truth's total mass) must still
    // majorize the scaled truth [10, 10]
    val env = IndexedSeq((10.0, 1.0), (0.0, 1.0))
    val scaled = expand(degScale(env, 2.0, 20.0))
    assert(dominates(scaled, Seq(10.0, 10.0)), s"lost domination: $scaled")
  }
}
