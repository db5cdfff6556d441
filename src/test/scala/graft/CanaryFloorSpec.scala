package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.CanaryFloor

/** Pins the cross-round canary-floor contract (VERDICT r17 #4):
  * `tools/canary_floor.json` is load-bearing for the calm-start gate
  * and the adj-primary promotion, so its format and update rules are
  * contract, not convention — a typo'd or hand-edited floor (e.g. 0.0)
  * must read as absent, floors only ever decrease, one round's drop is
  * bounded, and per-cpu / per-regime keys never clobber each other. */
class CanaryFloorSpec extends AnyFunSuite {

  test("parse round-trip: updated text reads back the written floors") {
    val t1 = CanaryFloor.updated("", "floor_sec_32", 0.0789).get
    assert(CanaryFloor.read(t1, "floor_sec_32").contains(0.0789))
    val t2 = CanaryFloor.updated(t1, "hot_floor_sec_32", 0.0461).get
    assert(CanaryFloor.read(t2, "floor_sec_32").contains(0.0789))
    assert(CanaryFloor.read(t2, "hot_floor_sec_32").contains(0.0461))
    assert(CanaryFloor.keys(t2).toSet ===
      Set("floor_sec_32", "hot_floor_sec_32"))
  }

  test("per-cpu keying: updating one cpu count preserves the others") {
    val txt = """{"floor_sec_32":0.0711,"floor_sec_8":0.0774}"""
    val out = CanaryFloor.updated(txt, "floor_sec_32", 0.0650).get
    assert(CanaryFloor.read(out, "floor_sec_32").contains(0.0650))
    assert(CanaryFloor.read(out, "floor_sec_8").contains(0.0774))
  }

  test("gate and hot regime families coexist: a gate-floor rewrite " +
      "never drops the hot floor") {
    val txt = """{"floor_sec_32":0.0711,"hot_floor_sec_32":0.0400}"""
    val out = CanaryFloor.updated(txt, "floor_sec_32", 0.0700).get
    assert(CanaryFloor.read(out, "hot_floor_sec_32").contains(0.0400))
    // and the hot-floor key regex never partially matches the gate key
    assert(CanaryFloor.read(txt, "floor_sec_32").contains(0.0711))
  }

  test("only-downward: an observation above the prior is a no-op write") {
    val txt = """{"floor_sec_32":0.0711}"""
    assert(CanaryFloor.updated(txt, "floor_sec_32", 0.0800).isEmpty)
    assert(CanaryFloor.updated(txt, "floor_sec_32", 0.0711).isEmpty)
  }

  test("bounded drop: one round lowers a floor at most 20%") {
    val txt = """{"floor_sec_32":0.1000}"""
    // a freak 0.03 s sample must not lock the gate onto an unreachable
    // bar — the write clamps to prior * 0.8; a real speed-up converges
    // over rounds
    val out = CanaryFloor.updated(txt, "floor_sec_32", 0.0300).get
    assert(CanaryFloor.read(out, "floor_sec_32").contains(0.0800))
    // a drop inside the bound lands verbatim
    val out2 = CanaryFloor.updated(txt, "floor_sec_32", 0.0900).get
    assert(CanaryFloor.read(out2, "floor_sec_32").contains(0.0900))
  }

  test("a non-positive or non-finite stored floor reads as absent") {
    assert(CanaryFloor.read("""{"floor_sec_32":0.0}""",
      "floor_sec_32").isEmpty)
    assert(CanaryFloor.read("""{"floor_sec_32":-0.05}""",
      "floor_sec_32").isEmpty)
    assert(CanaryFloor.read("""{"floor_sec_32":garbage}""",
      "floor_sec_32").isEmpty)
    assert(CanaryFloor.read("", "floor_sec_32").isEmpty)
    // and an absent prior accepts the first observation verbatim
    assert(CanaryFloor.nextValue(None, 0.0461).contains(0.0461))
  }

  test("a hand-edited zero floor is replaced, not re-serialized") {
    val txt = """{"floor_sec_32":0.0,"floor_sec_8":0.0774}"""
    // the 0.0 prior reads as absent, so the observation lands as the
    // first learning round for that key
    val out = CanaryFloor.updated(txt, "floor_sec_32", 0.0789).get
    assert(CanaryFloor.read(out, "floor_sec_32").contains(0.0789))
    assert(CanaryFloor.read(out, "floor_sec_8").contains(0.0774))
  }

  test("an unusable observation never writes") {
    val txt = """{"floor_sec_32":0.0711}"""
    assert(CanaryFloor.updated(txt, "floor_sec_32", 0.0).isEmpty)
    assert(CanaryFloor.updated(txt, "floor_sec_32", -1.0).isEmpty)
    assert(CanaryFloor.updated(txt, "floor_sec_32",
      Double.PositiveInfinity).isEmpty)
    assert(CanaryFloor.updated(txt, "floor_sec_32", Double.NaN).isEmpty)
  }

  test("the repo's live floor file parses under the contract") {
    val p = java.nio.file.Paths.get("tools/canary_floor.json")
    if (java.nio.file.Files.exists(p)) {
      val txt = java.nio.file.Files.readString(p)
      val ks = CanaryFloor.keys(txt)
      assert(ks.nonEmpty, "live floor file carries no parseable keys")
      ks.foreach { k =>
        assert(CanaryFloor.read(txt, k).nonEmpty,
          s"live floor $k is unusable (non-positive or malformed)")
      }
    }
  }
}
