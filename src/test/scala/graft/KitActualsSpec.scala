package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.KitActuals

/** The kit-actuals disk cache (Bench's zero-execution warm path):
  * entries key on (label, sql-sha) inside a data-fingerprint-keyed
  * file; node actuals key on the joined table SET, so they transfer
  * across tree shapes; a new shape's subsets MERGE into the entry. */
class KitActualsSpec extends AnyFunSuite {

  private def tmpPath(): String = {
    val f = java.io.File.createTempFile("graft_kit_actuals_test", ".json")
    f.delete()
    f.getAbsolutePath
  }

  test("put/get round-trips through disk and merges new subsets") {
    val path = tmpPath()
    val a = new KitActuals(path)
    val sha = KitActuals.sha("SELECT count(*) FROM t")
    a.put("q1", sha, 42.0, Map("a,b" -> 10.0, "a,b,c" -> 42.0))
    // merge: a different tree shape measured a new intermediate subset
    a.put("q1", sha, 42.0, Map("b,c" -> 7.0))
    assert(a.get("q1", sha).map(_._2) ===
      Some(Map("a,b" -> 10.0, "a,b,c" -> 42.0, "b,c" -> 7.0)))

    val b = new KitActuals(path)
    assert(b.load() === 1)
    val (root, nodes) = b.get("q1", sha).get
    assert(root === 42.0)
    assert(nodes === Map("a,b" -> 10.0, "a,b,c" -> 42.0, "b,c" -> 7.0))
    new java.io.File(path).delete(): Unit
  }

  test("a changed query text misses (sha rides the key)") {
    val path = tmpPath()
    val a = new KitActuals(path)
    a.put("q1", KitActuals.sha("SELECT 1"), 1.0, Map.empty)
    assert(a.get("q1", KitActuals.sha("SELECT 2")) === None)
    new java.io.File(path).delete(): Unit
  }

  test("skip sentinels: attempt marker survives a crash, results overwrite it") {
    val path = tmpPath()
    val a = new KitActuals(path)
    val sha = KitActuals.sha("SELECT count(*) FROM t")
    // every sentinel is a skip; a real root is not
    assert(KitActuals.isSkip(KitActuals.TimedOut))
    assert(KitActuals.isSkip(KitActuals.Crashed))
    assert(KitActuals.isSkip(KitActuals.BoundSkipped))
    assert(!KitActuals.isSkip(42.0) && !KitActuals.isSkip(-1.0))
    // the bench persists Crashed just before attempting an execution;
    // a successful measurement must REPLACE the marker
    a.put("q1", sha, KitActuals.Crashed, Map.empty)
    val crashed = new KitActuals(path)
    crashed.load()
    assert(crashed.get("q1", sha).exists(e => KitActuals.isSkip(e._1)))
    a.put("q1", sha, 42.0, Map("a,b" -> 42.0))
    val reloaded = new KitActuals(path)
    reloaded.load()
    assert(reloaded.get("q1", sha) === Some((42.0, Map("a,b" -> 42.0))))
    new java.io.File(path).delete(): Unit
  }

  test("set keys are order-canonical; missing file loads empty") {
    assert(KitActuals.key(Set("b", "a", "c")) === "a,b,c")
    val ghost = new KitActuals("/tmp/graft_kit_actuals_does_not_exist.json")
    assert(ghost.load() === 0)
    assert(ghost.size === 0)
  }
}
