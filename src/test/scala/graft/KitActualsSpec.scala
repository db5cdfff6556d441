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

  test("closure validity: stamped entries require a MATCHING computable " +
      "digest; legacy entries reconstruct but never seed (ADVICE r16)") {
    val stamped = Map("a,b" -> 10.0, KitActuals.ClosureKey -> 7.0)
    val legacy = Map("a,b" -> 10.0)
    // stamp matches a computable current digest: valid everywhere
    assert(KitActuals.closureValid(stamped, Some(7.0), forSeeding = false))
    assert(KitActuals.closureValid(stamped, Some(7.0), forSeeding = true))
    // stamp mismatch (the closure changed): invalid everywhere — values
    // measured under another derived-predicate closure never transplant
    assert(!KitActuals.closureValid(stamped, Some(9.0), forSeeding = false))
    assert(!KitActuals.closureValid(stamped, Some(9.0), forSeeding = true))
    // current digest uncomputable: a stamped entry CANNOT be validated —
    // reject (the old vacuous-forall accepted it, ADVICE r16)
    assert(!KitActuals.closureValid(stamped, None, forSeeding = false))
    assert(!KitActuals.closureValid(stamped, None, forSeeding = true))
    // legacy (unstamped): reconstruction-only. Closures had only grown
    // when these were written, so the value is at worst an overcount —
    // loose but sound for a q-error row; NEVER sound as an
    // exact-equality seed (a later closure narrowing would make it an
    // undercount fed into the persisted exact-count cache)
    assert(KitActuals.closureValid(legacy, Some(7.0), forSeeding = false))
    assert(KitActuals.closureValid(legacy, None, forSeeding = false))
    assert(!KitActuals.closureValid(legacy, Some(7.0), forSeeding = true))
    assert(!KitActuals.closureValid(legacy, None, forSeeding = true))
  }

  test("putReplacing drops the stale node map wholesale: a re-measure " +
      "after a closure change must not launder old-closure subsets " +
      "under the fresh stamp (ADVICE r16)") {
    val path = tmpPath()
    val a = new KitActuals(path)
    val sha = KitActuals.sha("SELECT count(*) FROM t")
    // measured under closure A: two subsets + stamp
    a.put("q1", sha, 42.0,
      Map("a,b" -> 10.0, "a,b,c" -> 42.0, KitActuals.ClosureKey -> 1.0))
    // the closure changes (digest 2.0) and the query re-measures with a
    // tree whose subsets only partially overlap: the merging put would
    // keep "a,b" = 10.0 (an old-closure value) under the NEW stamp
    a.putReplacing("q1", sha, 40.0,
      Map("b,c" -> 5.0, "a,b,c" -> 40.0, KitActuals.ClosureKey -> 2.0))
    val reloaded = new KitActuals(path)
    reloaded.load()
    val (root, nodes) = reloaded.get("q1", sha).get
    assert(root === 40.0)
    assert(nodes === Map("b,c" -> 5.0, "a,b,c" -> 40.0,
      KitActuals.ClosureKey -> 2.0))
    assert(!nodes.contains("a,b"), "old-closure subset must not survive")
    new java.io.File(path).delete(): Unit
  }

  test("set keys are order-canonical; missing file loads empty") {
    assert(KitActuals.key(Set("b", "a", "c")) === "a,b,c")
    val ghost = new KitActuals("/tmp/graft_kit_actuals_does_not_exist.json")
    assert(ghost.load() === 0)
    assert(ghost.size === 0)
  }
}
