package graft.bench

import scala.collection.concurrent.TrieMap

/** Disk-persisted ACTUAL join-node cardinalities for the workload-kit
  * bound-tightness rows.
  *
  * A kit query's per-node actual output rows are a property of the DATA
  * and the joined table SET — not of the join order the optimizer chose
  * this run (any tree shape over the same subset produces the same
  * output cardinality). The bench previously re-executed every kit
  * query on every run to re-measure numbers that cannot change, which
  * at 80 kit queries × multi-way sf0.1 joins dominated the whole bench
  * (~40+ min); the reference grades bound tightness against true
  * cardinalities it likewise computes once and reuses
  * (/root/reference/postbound/opt/_cardinalities.py:20 — precise
  * cardinalities are cached per query).
  *
  * Entries are keyed by (query label, SHA-256 of the query text) inside
  * a file keyed by the data fingerprint, so editing a kit query, or
  * regenerating the data, invalidates exactly the affected entries. A
  * run whose optimizer picks a tree containing a table subset the cache
  * has no actual for simply re-executes and merges the new subsets in.
  */
final class KitActuals(path: String) {
  // (label, sqlSha) -> (root actual, tableSetKey -> node actual)
  private val cache = TrieMap.empty[(String, String), (Double, Map[String, Double])]

  def get(label: String, sha: String): Option[(Double, Map[String, Double])] =
    cache.get((label, sha))

  /** Execution-feasibility sentinel rows ([[KitActuals.TimedOut]] /
    * [[KitActuals.Crashed]]) — see the version-migration in
    * [[KitActuals.forDir]]. */
  def skipSentinels: Seq[(String, String, Double)] =
    cache.toSeq.collect {
      case ((l, s), (root, _))
          if root == KitActuals.TimedOut || root == KitActuals.Crashed =>
        (l, s, root)
    }

  /** Adopt a sentinel from an older-version cache without clobbering a
    * measured entry. */
  def adoptSentinel(label: String, sha: String, root: Double): Unit =
    if (cache.putIfAbsent((label, sha), (root, Map.empty)).isEmpty)
      try persist() catch { case _: Throwable => }

  /** Merge `nodes` into the entry (keeps actuals for table subsets an
    * earlier tree shape produced) and persist atomically. Merge ONLY
    * when the existing node map is valid under the same closure as the
    * new one: a re-measurement after a closure change must use
    * [[putReplacing]], or subsets measured under the OLD closure would
    * be re-stamped with the new digest (ADVICE r16). */
  def put(label: String, sha: String, root: Double,
      nodes: Map[String, Double]): Unit = {
    val merged = cache.get((label, sha))
      .map { case (_, old) => old ++ nodes }.getOrElse(nodes)
    cache.put((label, sha), (root, merged))
    try persist() catch { case _: Throwable => }
  }

  /** Replace the entry WHOLESALE (drops every previously stored node
    * actual) and persist atomically — the re-measure path after a
    * closure-digest mismatch: the old node map's values were measured
    * under a different derived-predicate closure, and merging them
    * under the fresh "__closure" stamp would launder them into values
    * later runs trust for exact-count seeding. */
  def putReplacing(label: String, sha: String, root: Double,
      nodes: Map[String, Double]): Unit = {
    cache.put((label, sha), (root, nodes))
    try persist() catch { case _: Throwable => }
  }

  def size: Int = cache.size

  def load(): Int = {
    if (!new java.io.File(path).exists()) return 0
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(txt) match {
        case JArray(items) =>
          items.foreach {
            case JObject(fields) =>
              val m = fields.toMap
              (m.get("label"), m.get("sha"), m.get("root"), m.get("nodes")) match {
                case (Some(JString(l)), Some(JString(s)), Some(root), Some(JObject(ns))) =>
                  val nodes = ns.collect {
                    case (k, JDouble(v)) => k -> v
                    case (k, JInt(v)) => k -> v.toDouble
                  }.toMap
                  val r = root match {
                    case JDouble(v) => v
                    case JInt(v) => v.toDouble
                    case _ => -1.0
                  }
                  cache.putIfAbsent((l, s), (r, nodes)): Unit
                case _ =>
              }
            case _ =>
          }
          items.size
        case _ => 0
      }
    } catch { case _: Throwable => 0 }
  }

  private def persist(): Unit = {
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = cache.toSeq.sortBy(_._1).map { case ((l, s), (root, nodes)) =>
      val ns = nodes.toSeq.sorted.map { case (k, v) =>
        s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      s"""{"label":${jstr(l)},"sha":${jstr(s)},"root":$root,"nodes":$ns}"""
    }.mkString("[", ",", "]")
    val target = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Paths.get(
      s"$path.tmp.${ProcessHandle.current().pid()}.${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp, json)
    import java.nio.file.StandardCopyOption._
    try java.nio.file.Files.move(tmp, target, REPLACE_EXISTING, ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      java.nio.file.Files.move(tmp, target, REPLACE_EXISTING)
    }
  }
}

object KitActuals {
  /** Root-actual sentinel: this query's execution exceeded the bench's
    * per-query cap once — skip the measurement in every later run
    * (delete the cache file to retry, e.g. after raising the cap). */
  val TimedOut: Double = -2.0

  /** Root-actual sentinel: a bench persisted this marker immediately
    * before ATTEMPTING the execution and never replaced it with a
    * result — the JVM died mid-measurement (observed: an aliased-walk
    * fan-out whose hash joins exhaust the heap faster than the
    * cancellation cap can fire, taking the whole bench down with an
    * OutOfMemoryError). Treated like [[TimedOut]]: skip forever rather
    * than re-crash every later bench on the same query. */
  val Crashed: Double = -3.0

  /** Root-actual sentinel: the execution was never attempted because
    * the optimizer's own SOUND upper bound on the result cardinality
    * already proves it hopeless at the bench's per-query cap (bound ≥
    * actual is pinned kit-wide, so a bound above the gate means the
    * true intermediate cannot be executed either). Persisted so the
    * skip decision is visible in the cache, not silent. */
  val BoundSkipped: Double = -4.0

  /** True for any persisted skip sentinel. */
  def isSkip(root: Double): Boolean =
    root == TimedOut || root == Crashed || root == BoundSkipped

  /** Harness-semantics version, part of the cache file name: bump when
    * the MEANING of a measured node actual changes with query text and
    * data unchanged. v2 (r15): PlanEnforcer compiles the full
    * equivalence-closure derived predicates into enforced plans, so
    * per-node actuals are now the fully-implied-filtered subset
    * cardinalities — a true data property independent of join order
    * (v1 actuals depended on how many inference rounds Catalyst's
    * optimizer happened to stack under the enforced order). */
  val Version = 2

  def forDir(sfDir: String): KitActuals = {
    val fp = graft.Tables.dataFingerprint(sfDir)
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_kit_actuals_v${Version}_$fp.json"
    // bygone fingerprints' files only accumulate — same retention as
    // the probe-cache snapshots
    graft.stats.EmulatedStatistics.retentionSweep(path)
    val ka = new KitActuals(path)
    ka.load()
    // migrate execution-feasibility sentinels (TimedOut/Crashed) from
    // the previous version's file: they record that a query's
    // EXECUTION wedged the JVM or outran the cap — a property of the
    // query text and data, unaffected by the node-actuals semantics a
    // version bump changes. Without this, every bump re-attempts the
    // known JVM-killers (observed at the v2 bump: the gw77 re-attempt
    // GC-wedged a 40 GiB bench JVM). Measured values do NOT migrate —
    // re-measuring them is the bump's whole point.
    val prevPath =
      if (Version == 2)
        s"${System.getProperty("java.io.tmpdir")}/graft_kit_actuals_$fp.json"
      else s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_kit_actuals_v${Version - 1}_$fp.json"
    if (new java.io.File(prevPath).exists()) {
      val prev = new KitActuals(prevPath)
      prev.load()
      prev.skipSentinels.foreach { case (l, s, root) =>
        ka.adoptSentinel(l, s, root)
      }
    }
    ka
  }

  /** Reserved node-map key: the [[graft.opt.JoinGraph.closureDigest]]
    * of the query's derived-predicate closure at measurement time. */
  val ClosureKey = "__closure"

  /** Whether a persisted entry's node actuals are valid under the
    * CURRENT closure digest.
    *
    *  - Stamped entry: valid iff the stamp equals a COMPUTABLE current
    *    digest. A `current` of None (the digest computation failed)
    *    rejects stamped entries — an entry that cannot be validated
    *    must not be trusted (ADVICE r16: the old vacuous-forall
    *    accepted them).
    *  - Legacy (unstamped) entry: accepted for warm RECONSTRUCTION
    *    only (`forSeeding = false`) — closures have only grown, so an
    *    old value is at worst an overcount of today's truth, loose but
    *    sound for a q-error row. NEVER accepted for exact-count
    *    SEEDING (`forSeeding = true`): a seed is trusted as an exact
    *    equality, and a future closure NARROWING would turn the
    *    unverifiable legacy value into an undercount seeded into the
    *    persisted cache (unsound bounds — ADVICE r16). Legacy entries
    *    earn a stamp only by actually re-measuring.
    */
  def closureValid(nodes: Map[String, Double], current: Option[Double],
      forSeeding: Boolean): Boolean =
    nodes.get(ClosureKey) match {
      case Some(stamp) => current.contains(stamp)
      case None => !forSeeding
    }

  def sha(sql: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(sql.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  /** Canonical key for a joined table set. */
  def key(tables: Set[String]): String = tables.toSeq.sorted.mkString(",")
}
