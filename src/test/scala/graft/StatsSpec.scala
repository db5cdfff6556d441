package graft

import graft.qal.QueryFacade
import graft.stats.{EmulatedStatistics, Prewarm}

class StatsSpec extends SparkSpec {

  private def leafOf(table: String) = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark,
      s"SELECT count(*) FROM $table, region WHERE 1 = 0 AND r_regionkey >= 0")
    q.joinBlock.get.leafPlan(table)
  }

  test("emulated statistics: rowcount, ndv, max frequency, min/max") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    assert(stats.rowCount(nation) === 25L)
    assert(stats.distinctCount(nation, "n_nationkey") === 25L)
    assert(stats.maxFrequency(nation, "n_regionkey") >= 5L)
    val (lo, hi) = stats.minMax(nation, "n_nationkey")
    assert(lo === 0.0 && hi === 24.0)
  }

  test("filtered row-count keys are parse-stable: two independent parses " +
      "of the same query share ONE cache entry") {
    // the old count[expr#hash] tag embedded the filter's raw exprIds,
    // which are fresh per parse — every new JVM re-paid every filtered
    // base-count probe and the persisted snapshot grew without bound
    // (measured: 2,110 copies of one region-filter probe). Keying on
    // Filter(fl, plan) plan-canonicalizes the exprIds positionally.
    Tables.registerAll(spark, sfDir)
    val stats = new EmulatedStatistics(spark)
    def probeOnce(): Long = {
      val q = QueryFacade(spark,
        "SELECT count(*) FROM customer, nation WHERE c_nationkey = " +
          "n_nationkey AND c_mktsegment = 'BUILDING'")
      val b = q.joinBlock.get
      stats.rowCount(b.leafPlan("customer"),
        QueryFacade.andAll(b.filtersFor("customer")))
    }
    val v1 = probeOnce()
    val sizeAfterFirst = stats.cacheSize
    val v2 = probeOnce() // fresh parse, fresh exprIds — must HIT
    assert(v1 === v2)
    assert(stats.cacheSize === sizeAfterFirst,
      "a re-parse of the same filter must not mint a new cache key")
  }

  test("sampled statistics track full-data probes within sampling error") {
    val full = new EmulatedStatistics(spark)
    val sampled = new EmulatedStatistics(spark, sampleFraction = Some(0.5))
    val li = leafOf("lineitem")
    val exact = full.rowCount(li)
    val est = sampled.rowCount(li)
    assert(math.abs(est - exact).toDouble / exact < 0.15, s"est=$est exact=$exact")
    val mfExact = full.maxFrequency(li, "l_suppkey")
    val mfEst = sampled.maxFrequency(li, "l_suppkey")
    assert(mfEst > 0)
    assert(math.max(mfEst, mfExact).toDouble / math.min(mfEst, mfExact) < 2.0,
      s"maxfreq est=$mfEst exact=$mfExact")
    // ndv and min/max intentionally bypass sampling (not count-scalable)
    assert(sampled.distinctCount(li, "l_suppkey") ===
      full.distinctCount(li, "l_suppkey"))
    assert(sampled.minMax(li, "l_quantity") === full.minMax(li, "l_quantity"))
  }

  test("approximate max frequency matches exact on a skewed column") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val exact = stats.maxFrequency(nation, "n_regionkey")
    val approx = stats.approxMaxFrequency(nation, "n_regionkey", support = 0.01)
    assert(approx === exact)
  }

  test("MCV and histogram probes") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val mcv = stats.mostCommonValues(nation, "n_regionkey", 3)
    assert(mcv.entries.size === 3)
    assert(mcv.maxFrequency === stats.maxFrequency(nation, "n_regionkey"))
    val hist = stats.histogram(nation, "n_nationkey", 5)
    assert(hist.total === 25L)
    assert(hist.buckets === 5)
  }

  test("tuple max frequency bounds the conjunction the per-column probes " +
      "miss, and empty relations probe to zero") {
    import spark.implicits._
    val stats = new EmulatedStatistics(spark)
    // (k1, k2): k1 has max freq 3, k2 has max freq 3, but no (k1, k2)
    // combination repeats more than twice
    Seq((1, 10), (1, 10), (1, 20), (2, 10), (2, 20), (2, 20))
      .toDF("k1", "k2").createOrReplaceTempView("tmf")
    val q = QueryFacade(spark,
      "SELECT count(*) FROM tmf, region WHERE 1 = 0 AND r_regionkey >= 0")
    val plan = q.joinBlock.get.leafPlan("tmf")
    assert(stats.maxFrequency(plan, "k1") === 3L)
    assert(stats.maxFrequency(plan, "k2") === 3L)
    assert(stats.maxFrequency(plan, Seq("k1", "k2")) === 2L)
    // single-column Seq delegates to the scalar probe (same cache key)
    assert(stats.maxFrequency(plan, Seq("k1")) === 3L)
    // fully filtered-out relation: max over zero groups is 0, not a crash
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val empty = Filter(org.apache.spark.sql.catalyst.expressions.Literal(false),
      plan)
    assert(stats.maxFrequency(empty, "k1") === 0L)
    assert(stats.maxFrequency(empty, Seq("k1", "k2")) === 0L)
  }

  test("an empty SAMPLE of a non-empty relation re-probes unsampled " +
      "instead of reporting 0 (bound-soundness guard)") {
    // fraction small enough that the 25-row nation sample is empty with
    // the fixed seed — without the guard every probe would return 0 and
    // the UES bound would collapse to 0 on a non-empty relation
    val sampled = new EmulatedStatistics(spark, sampleFraction = Some(1e-6))
    val nation = leafOf("nation")
    assert(sampled.rowCount(nation) === 25L)
    assert(sampled.maxFrequency(nation, "n_regionkey") === 5L)
    assert(sampled.maxFrequency(nation,
      Seq("n_regionkey", "n_nationkey")) === 1L)
    assert(sampled.mcvFrequencies(nation, "n_regionkey", 3).nonEmpty)
    // a truly empty relation still probes to 0/empty under sampling
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val empty = Filter(
      org.apache.spark.sql.catalyst.expressions.Literal(false), nation)
    assert(sampled.rowCount(empty) === 0L)
    assert(sampled.maxFrequency(empty, "n_regionkey") === 0L)
    assert(sampled.mcvFrequencies(empty, "n_regionkey", 3).isEmpty)
  }

  test("bloom semijoin count: overcounts only, tracks the exact semijoin") {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val stats = new EmulatedStatistics(spark)
    val q = QueryFacade(spark,
      """SELECT count(*) FROM nation, region, customer
         WHERE n_regionkey = r_regionkey AND n_nationkey = c_nationkey
           AND r_name = 'ASIA'""")
    val b = q.joinBlock.get
    val nation = b.leafPlan("nation")
    val regionAsia = Filter(
      QueryFacade.andAll(b.filtersFor("region")).get, b.leafPlan("region"))
    // exact semijoin baseline via SQL
    val exact1 = spark.sql(
      """SELECT count(*) FROM nation WHERE n_regionkey IN
         (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')""")
      .head().getLong(0)
    val bloom1 = stats.bloomSemijoinCount(nation,
      Seq(("n_regionkey", regionAsia, "r_regionkey")))
    assert(bloom1 >= exact1, "bloom membership undercounted — unsound")
    assert(bloom1 <= stats.rowCount(nation))
    assert(bloom1 <= exact1 + 2, s"fp rate implausible: $bloom1 vs $exact1")
    // conjunction of two memberships (the multi-edge candidate shape)
    val exact2 = spark.sql(
      """SELECT count(*) FROM nation WHERE n_regionkey IN
         (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
         AND n_nationkey IN (SELECT c_nationkey FROM customer)""")
      .head().getLong(0)
    val bloom2 = stats.bloomSemijoinCount(nation,
      Seq(("n_regionkey", regionAsia, "r_regionkey"),
        ("n_nationkey", b.leafPlan("customer"), "c_nationkey")))
    assert(bloom2 >= exact2 && bloom2 <= bloom1)
    // memoized: the Long result is served from cache on re-probe
    val before = stats.cacheSize
    assert(stats.bloomSemijoinCount(nation,
      Seq(("n_regionkey", regionAsia, "r_regionkey"))) === bloom1)
    assert(stats.cacheSize === before)
  }

  test("cmsJoinCount overcounts the exact equi-join size, never under") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val customer = leafOf("customer")
    val lineitem = leafOf("lineitem")
    val orders = leafOf("orders")
    // fk join: Σ_v freq products = the true join size
    val exact1 = spark.sql(
      "SELECT count(*) FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey")
      .head().getLong(0)
    val cms1 = stats.cmsJoinCount(nation, "n_nationkey", customer, "c_nationkey")
    assert(cms1 >= exact1, s"cms $cms1 undercounts exact $exact1")
    assert(cms1 <= exact1 * 2, s"cms $cms1 too loose vs exact $exact1")
    // fact-to-fact: the quantity the mf·mf·ndv bound term overcharges
    val exact2 = spark.sql(
      "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey")
      .head().getLong(0)
    val cms2 = stats.cmsJoinCount(orders, "o_orderkey", lineitem, "l_orderkey")
    assert(cms2 >= exact2 && cms2 <= exact2 * 2, s"cms=$cms2 exact=$exact2")
    // memoized as a persistable Long (rides the disk cache)
    val before = stats.cacheSize
    assert(stats.cmsJoinCountIfCached(nation, "n_nationkey",
      customer, "c_nationkey") === Some(cms1))
    assert(stats.cmsJoinCount(nation, "n_nationkey",
      customer, "c_nationkey") === cms1)
    assert(stats.cacheSize === before)
  }

  test("MCV frequency vectors persist through the long-value disk cache") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val f = stats.mcvFrequencies(nation, "n_regionkey", 3)
    assert(f.size === 3 && f === f.sorted.reverse && f.head === 5L)
    val tup = stats.maxFrequency(nation, Seq("n_regionkey", "n_nationkey"))
    assert(tup === 1L) // nationkey is unique, so every tuple is unique
    val tmp = java.io.File.createTempFile("graft_stats_mcvf", ".json")
    stats.persistTo(tmp.getAbsolutePath)
    val fresh = new EmulatedStatistics(spark)
    assert(fresh.loadFrom(tmp.getAbsolutePath) > 0)
    assert(fresh.cacheSize > 0)
    // served from cache (no new entries appear), identical values,
    // including the Seq[Long] entry
    val loaded = fresh.cacheSize
    assert(fresh.mcvFrequencies(nation, "n_regionkey", 3) === f)
    assert(fresh.maxFrequency(nation, Seq("n_regionkey", "n_nationkey")) === tup)
    assert(fresh.cacheSize === loaded, "probes recomputed despite the cache")
    tmp.delete(): Unit
  }

  test("auto-persistence appends new probes to the WAL and compaction folds it") {
    val f = java.io.File.createTempFile("graft_stats_wal", ".json")
    f.delete() // start with neither snapshot nor WAL
    val wal = new java.io.File(f.getAbsolutePath + ".wal")
    val stats = new EmulatedStatistics(spark)
    stats.autoPersistTo(f.getAbsolutePath)
    val nation = leafOf("nation")
    val n = stats.rowCount(nation)
    val ndv = stats.distinctCount(nation, "n_name")
    val mcv = stats.mcvFrequencies(nation, "n_regionkey", 3)
    // each NEW probe appended one WAL line; no snapshot was written
    assert(wal.exists() && !f.exists(),
      "auto-persist should append to the WAL, not rewrite the snapshot")
    val walLines = java.nio.file.Files.readAllLines(wal.toPath)
    assert(walLines.size === 3, s"one line per new probe, got $walLines")
    stats.rowCount(nation) // memoized: appends nothing
    assert(java.nio.file.Files.readAllLines(wal.toPath).size === 3)
    // a fresh instance recovers every probe from the WAL alone
    val fresh = new EmulatedStatistics(spark)
    assert(fresh.loadFrom(f.getAbsolutePath) === 3)
    assert(fresh.rowCountIfCached(nation) === Some(n))
    assert(fresh.mcvFrequencies(nation, "n_regionkey", 3) === mcv)
    // compaction (the explicit snapshot) folds the WAL into the file
    // and retires it — including entries appended by ANOTHER instance
    val other = new EmulatedStatistics(spark)
    other.autoPersistTo(f.getAbsolutePath)
    other.maxFrequency(leafOf("nation"), "n_regionkey"): Unit
    stats.persistTo(f.getAbsolutePath)
    assert(f.exists() && !wal.exists(),
      "compaction should write the snapshot and retire the WAL")
    val recovered = new EmulatedStatistics(spark)
    assert(recovered.loadFrom(f.getAbsolutePath) >= 4,
      "the other instance's WAL entry must survive the fold")
    assert(recovered.rowCountIfCached(nation) === Some(n))
    assert(recovered.distinctCount(nation, "n_name") === ndv)
    f.delete(): Unit
  }

  test("statistics are memoized and survive a disk round-trip") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    stats.rowCount(nation); stats.distinctCount(nation, "n_name")
    val before = stats.cacheSize
    stats.rowCount(nation) // memoized: no new entry
    assert(stats.cacheSize === before)

    val f = java.io.File.createTempFile("graft_stats", ".json")
    stats.persistTo(f.getAbsolutePath)
    val fresh = new EmulatedStatistics(spark)
    assert(fresh.loadFrom(f.getAbsolutePath) >= 2)
    assert(fresh.rowCount(nation) === 25L) // served from loaded cache
  }

  test("probe-class version bump invalidates exactly that class") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val n = stats.rowCount(nation)
    val ndv = stats.distinctCount(nation, "n_name")
    val f = java.io.File.createTempFile("graft_stats_ver", ".json")
    stats.persistTo(f.getAbsolutePath)

    // same versions: the persisted entry is a warm hit
    val same = new EmulatedStatistics(spark)
    assert(same.loadFrom(f.getAbsolutePath) >= 2)
    assert(same.rowCountIfCached(nation) === Some(n))

    // bumped `count` class: the stale entry loads but never matches the
    // versioned tag — the probe recomputes under `count...@v2` — while
    // the unbumped `ndv` class stays warm (no new ndv entry appears)
    val bumped = new EmulatedStatistics(spark,
      probeClassVersions = Map("count" -> 2))
    assert(bumped.loadFrom(f.getAbsolutePath) >= 2)
    assert(bumped.rowCountIfCached(nation) === None,
      "bumped class served a stale-version entry")
    assert(bumped.rowCount(nation) === n)
    assert(bumped.cacheTagCounts.keys.exists(_.endsWith("@v2")),
      s"recomputed entry missing version suffix: ${bumped.cacheTagCounts}")
    val afterCount = bumped.cacheSize
    assert(bumped.distinctCount(nation, "n_name") === ndv)
    assert(bumped.cacheSize === afterCount,
      "unbumped ndv class recomputed despite the warm cache")
    f.delete(): Unit
  }

  test("scalarLong evaluates a single-row aggregate exactly, caches it, " +
      "and reads an empty-input NULL as 0") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val key = nation.output.find(_.name == "n_nationkey").get
    val sumPlan = Aggregate(Nil,
      Seq(Alias(Sum(key).toAggregateExpression(), "s")()), nation)
    // 0 + 1 + ... + 24
    assert(stats.scalarLong(sumPlan) === Some(300L))
    assert(stats.scalarLongIfCached(sumPlan) === Some(300L))
    // an aggregate over zero rows yields NULL -> reads as 0 (the
    // eager-aggregation count of an empty join)
    val empty = Aggregate(Nil,
      Seq(Alias(Sum(key).toAggregateExpression(), "s")()),
      Filter(EqualTo(key, Literal(-1)), nation))
    assert(stats.scalarLong(empty) === Some(0L))
  }

  test("concurrent compactors converge: a rewrite merges the current " +
      "snapshot instead of last-writer-wins") {
    val f = java.io.File.createTempFile("graft_stats_conv", ".json")
    val nation = leafOf("nation")
    val seed = new EmulatedStatistics(spark)
    seed.rowCount(nation): Unit
    seed.persistTo(f.getAbsolutePath)
    // B loads the snapshot BEFORE A's compaction lands
    val b = new EmulatedStatistics(spark)
    assert(b.loadFrom(f.getAbsolutePath) >= 1)
    // A loads, pays a probe, compacts it into the snapshot (WAL retired)
    val a = new EmulatedStatistics(spark)
    a.loadFrom(f.getAbsolutePath): Unit
    val ndvA = a.distinctCount(nation, "n_name")
    a.persistTo(f.getAbsolutePath)
    // B now compacts ITS probe: a whole-cache rewrite that ignored the
    // current snapshot would silently drop A's paid-for entry
    b.maxFrequency(nation, "n_regionkey"): Unit
    b.persistTo(f.getAbsolutePath)
    val merged = new EmulatedStatistics(spark)
    assert(merged.loadFrom(f.getAbsolutePath) >= 3)
    val before = merged.cacheSize
    assert(merged.distinctCount(nation, "n_name") === ndvA)
    assert(merged.cacheSize === before,
      "A's compacted entry was dropped by B's later compaction")
    f.delete(): Unit
  }

  test("an oversized inherited WAL is folded at autoPersistTo time") {
    val f = java.io.File.createTempFile("graft_stats_walsz", ".json")
    f.delete()
    val wal = new java.io.File(f.getAbsolutePath + ".wal")
    // one valid line + enough garbage to cross the size backstop (the
    // short-lived-JVM inheritance case: no instance ever reaches the
    // append-counter trigger, the file must still get folded)
    val w = new java.io.PrintWriter(wal, "UTF-8")
    w.println("""{"plan":"p#1","tag":"count","value":42}""")
    val junk = "x" * 4096
    (1 to ((EmulatedStatistics.WalCompactBytes / 4096L).toInt + 8))
      .foreach(_ => w.println(junk))
    w.close()
    assert(wal.length() > EmulatedStatistics.WalCompactBytes)
    val stats = new EmulatedStatistics(spark)
    stats.autoPersistTo(f.getAbsolutePath)
    assert(f.exists() && !wal.exists(),
      "oversized WAL should be compacted into the snapshot on attach")
    val fresh = new EmulatedStatistics(spark)
    assert(fresh.loadFrom(f.getAbsolutePath) === 1,
      "the valid WAL entry must survive the fold (garbage dropped)")
    f.delete(): Unit
  }

  test("compaction evicts stale-version entries from snapshot and memory") {
    val f = java.io.File.createTempFile("graft_stats_evict", ".json")
    val nation = leafOf("nation")
    val old = new EmulatedStatistics(spark)
    old.rowCount(nation): Unit
    old.distinctCount(nation, "n_name"): Unit
    old.persistTo(f.getAbsolutePath)
    // a version bump orphans the persisted `count` entries: they load
    // (census sees them) but can never match a current key, and the
    // next compaction drops them from the snapshot and from memory
    val bumped = new EmulatedStatistics(spark,
      probeClassVersions = Map("count" -> 2))
    assert(bumped.loadFrom(f.getAbsolutePath) >= 2)
    assert(bumped.staleVersionCount >= 1, "census must see the orphan")
    val n = bumped.rowCount(nation) // recomputes under count@v2
    bumped.persistTo(f.getAbsolutePath)
    assert(bumped.evictedStaleCount >= 1)
    assert(bumped.staleVersionCount === 0,
      "evicted orphans must leave memory too")
    // the rewritten snapshot carries only live entries: a third
    // instance at the same versions loads no stale rows
    val clean = new EmulatedStatistics(spark,
      probeClassVersions = Map("count" -> 2))
    clean.loadFrom(f.getAbsolutePath): Unit
    assert(clean.staleVersionCount === 0)
    assert(clean.rowCountIfCached(nation) === Some(n))
    f.delete(): Unit
  }

  test("retention sweep deletes only old same-scheme sibling snapshots") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sweep").toFile
    def touch(name: String, ageDays: Int): java.io.File = {
      val g = new java.io.File(dir, name)
      java.nio.file.Files.writeString(g.toPath, "[]")
      g.setLastModified(
        System.currentTimeMillis() - ageDays.toLong * 24 * 3600 * 1000)
      g
    }
    val current = touch("graft_stats_cache_aaaaaaaa.json", 30)
    val currentWal = touch("graft_stats_cache_aaaaaaaa.json.wal", 30)
    val oldSnap = touch("graft_stats_cache_bbbbbbbb.json", 30)
    val oldWal = touch("graft_stats_cache_bbbbbbbb.json.wal", 30)
    val fresh = touch("graft_stats_cache_cccccccc.json", 1)
    val other = touch("unrelated_bbbbbbbb.json", 30)
    val stats = new EmulatedStatistics(spark)
    stats.autoPersistTo(current.getAbsolutePath)
    assert(current.exists() && currentWal.exists(),
      "the attached fingerprint's own triple must never be swept")
    assert(!oldSnap.exists() && !oldWal.exists(),
      "old sibling fingerprints must be swept")
    assert(fresh.exists(), "fresh siblings stay")
    assert(other.exists(), "files outside the naming scheme stay")
  }

  test("bucket sketch: per-bucket counts sum to the row count and " +
      "degrees bound per-value frequencies") {
    val stats = new EmulatedStatistics(spark)
    val nation = leafOf("nation")
    val (cnt, deg) = stats.bucketSketch(nation, "n_regionkey")
    val b = EmulatedStatistics.BucketCount
    assert(cnt.size === b && deg.size === b)
    assert(cnt.sum === stats.rowCount(nation))
    assert(deg.max === stats.maxFrequency(nation, "n_regionkey"))
    // degree never exceeds its bucket's count, and empty buckets are 0/0
    cnt.zip(deg).foreach { case (c, d) =>
      assert(d <= c); assert((c == 0L) == (d == 0L))
    }
    // low-ndv exactness: 5 region keys across 64 buckets — at most 5
    // non-empty buckets, so the per-bucket degree IS (modulo hash
    // collisions between keys) the per-value frequency
    assert(cnt.count(_ > 0L) <= 5)
    // a filtered relation zeroes the dead keys' buckets — the signal
    // the bucketized join term reads (a global max frequency cannot);
    // built through the same leaf + Filter shape the bound model's
    // statPlan uses
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val attr = nation.output.find(_.name == "n_regionkey").get
    val filtered = Filter(org.apache.spark.sql.catalyst.expressions
      .EqualTo(attr, org.apache.spark.sql.catalyst.expressions.Literal(0)),
      nation)
    val (fcnt, _) = stats.bucketSketch(filtered, "n_regionkey")
    assert(fcnt.count(_ > 0L) === 1, "one surviving key = one live bucket")
    assert(fcnt.sum === 5L)
    // sketches ride the Seq[Long] disk cache
    val f = java.io.File.createTempFile("graft_stats_bucket", ".json")
    stats.persistTo(f.getAbsolutePath)
    val fresh = new EmulatedStatistics(spark)
    fresh.loadFrom(f.getAbsolutePath): Unit
    val before = fresh.cacheSize
    assert(fresh.bucketSketch(nation, "n_regionkey") === ((cnt, deg)))
    assert(fresh.cacheSize === before, "sketch recomputed despite the cache")
    f.delete(): Unit
  }

  test("prewarm pins and releases relations") {
    val df = Tables.load(spark, sfDir, "nation")
    Prewarm.prewarm(df)
    assert(df.storageLevel.useMemory)
    Prewarm.release(df)
    assert(!df.storageLevel.useMemory)
  }
}
