package graft

import graft.qal.QueryFacade
import graft.transforms.{SqlEmitter, Transforms}

/** SQL-text emission (the reference's format_quick analog): for every
  * covered clause shape, parse -> emit -> re-execute must return the
  * original query's results; transformed plans emit runnable text too;
  * uncovered nodes fail loudly instead of emitting wrong SQL.
  */
class SqlEmitterSpec extends SparkSpec {

  private def roundTrips(sql: String): Unit = {
    Tables.registerAll(spark, sfDir)
    val plan = QueryFacade(spark, sql).analyzed
    val emitted = SqlEmitter.toSql(plan)
    assert(sameResults(spark.sql(emitted), spark.sql(sql)),
      s"round trip diverged.\noriginal: $sql\nemitted:  $emitted")
  }

  test("SPJ + aggregate + order round-trips") {
    roundTrips(
      """SELECT n_name, count(*) AS n FROM customer, orders, nation
         WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
           AND o_totalprice < 100000
         GROUP BY n_name ORDER BY n_name""")
  }

  test("self-join with aliases stays unambiguous") {
    roundTrips(
      """SELECT a.n_name, b.n_name AS other FROM nation a
         JOIN nation b ON a.n_regionkey = b.n_regionkey
         WHERE a.n_nationkey < b.n_nationkey
         ORDER BY a.n_name, other""")
  }

  test("outer join, distinct, limit/offset, having round-trip") {
    roundTrips(
      """SELECT c_mktsegment, count(o_orderkey) AS n
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment HAVING count(o_orderkey) > 0
         ORDER BY c_mktsegment""")
    roundTrips("SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey")
    roundTrips(
      "SELECT s_name FROM supplier ORDER BY s_name LIMIT 5")
  }

  test("set operations and derived tables round-trip") {
    roundTrips(
      """(SELECT n_name FROM nation WHERE n_regionkey = 0)
         UNION ALL (SELECT n_name FROM nation WHERE n_regionkey = 1)""")
    roundTrips(
      """SELECT n_name FROM nation WHERE n_regionkey < 3
         INTERSECT SELECT n_name FROM nation WHERE n_regionkey > 1""")
    roundTrips(
      """SELECT t.n, r_name FROM
           (SELECT n_regionkey AS k, count(*) AS n FROM nation GROUP BY n_regionkey) AS t
         JOIN region ON t.k = r_regionkey ORDER BY r_name""")
  }

  test("transformed plans emit runnable SQL") {
    Tables.registerAll(spark, sfDir)
    val base = QueryFacade(spark,
      """SELECT s_name, n_name FROM supplier, nation
         WHERE s_nationkey = n_nationkey ORDER BY s_name""").analyzed
    // drop the ORDER BY, re-emit, re-run: same rows, any order
    val noSort = SqlEmitter.toSql(Transforms.dropOrderBy(base))
    assert(!noSort.toUpperCase.contains("ORDER BY"))
    assert(sameResults(spark.sql(noSort),
      spark.sql("""SELECT s_name, n_name FROM supplier, nation
                   WHERE s_nationkey = n_nationkey""")))
    // count-star rewrite (on the sort-free block: ORDER BY under an
    // aggregate is meaningless and the emitter refuses to bury it)
    val counted = SqlEmitter.toSql(
      Transforms.asCountStar(Transforms.dropOrderBy(base)))
    assert(spark.sql(counted).head().getLong(0)
      === spark.table("supplier").count())
  }

  test("window functions round-trip with partitions, frames and lag") {
    roundTrips(
      """SELECT s_name, row_number() OVER (ORDER BY s_name) AS rn
         FROM supplier ORDER BY rn""")
    roundTrips(
      """SELECT s_nationkey, s_name,
           round(sum(s_acctbal) OVER (PARTITION BY s_nationkey
             ORDER BY s_name
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run
         FROM supplier ORDER BY s_nationkey, s_name""")
    roundTrips(
      """SELECT s_name,
           lag(s_acctbal, 1) OVER (PARTITION BY s_nationkey
             ORDER BY s_name) AS prev
         FROM supplier WHERE s_acctbal > 0 ORDER BY s_name""")
  }

  test("CTE containers round-trip as WITH clauses") {
    roundTrips(
      """WITH picked AS (SELECT n_nationkey, n_name FROM nation
                         WHERE n_regionkey < 3),
              cnt AS (SELECT count(*) AS c FROM picked)
         SELECT p.n_name, c.c AS total FROM picked p CROSS JOIN cnt c
         ORDER BY p.n_name""")
  }

  test("UNION DISTINCT round-trips") {
    roundTrips(
      """SELECT n_regionkey AS k FROM nation
         UNION SELECT r_regionkey AS k FROM region""")
  }

  test("by-name unions emit as positional SQL via reordered projections") {
    Tables.registerAll(spark, sfDir)
    val a = spark.sql("SELECT n_name AS name, n_regionkey AS k FROM nation")
    val b = spark.sql("SELECT r_regionkey AS k, r_name AS name FROM region")
    val df = a.unionByName(b) // columns cross-ordered on purpose
    val emitted = SqlEmitter.toSql(df.queryExecution.analyzed)
    assert(sameResults(spark.sql(emitted), df), emitted)
  }

  test("semi/anti joins emit as EXISTS / NOT EXISTS") {
    Tables.registerAll(spark, sfDir)
    import org.apache.spark.sql.functions._
    val c = spark.table("customer")
    val o = spark.table("orders")
    val df = c.join(o, expr("c_custkey = o_custkey"), "left_semi")
      .join(o.filter("o_orderstatus = 'F'"),
        expr("c_custkey = o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
    val emitted = SqlEmitter.toSql(df.queryExecution.analyzed)
    assert(emitted.contains("EXISTS") && emitted.contains("NOT EXISTS"),
      emitted)
    assert(sameResults(spark.sql(emitted), df), emitted)
  }

  test("lateral subqueries round-trip with qualified correlation") {
    roundTrips(
      """SELECT n_name, top_bal FROM nation,
           LATERAL (SELECT max(c_acctbal) AS top_bal FROM customer
                    WHERE c_nationkey = n_nationkey) t
         WHERE top_bal IS NOT NULL ORDER BY n_name""")
  }

  test("join-strategy hints survive emission and steer the re-executed " +
      "plan") {
    Tables.registerAll(spark, sfDir)
    val hinted = spark.sql(
      """SELECT /*+ BROADCAST(nation) */ s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""")
    val emitted = SqlEmitter.toSql(hinted.queryExecution.analyzed)
    assert(emitted.contains("/*+ BROADCAST(nation) */"), emitted)
    val reExec = spark.sql(emitted)
    assert(sameResults(reExec, hinted))
    // the hint must actually reach the physical planner of the re-run
    val phys = reExec.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys)
  }

  test("single-column generators round-trip inline") {
    roundTrips("SELECT explode(array(1, 2)) AS v FROM supplier")
    roundTrips(
      """SELECT s_nationkey, explode(sequence(1, 3)) AS step
         FROM supplier WHERE s_suppkey < 5 ORDER BY s_nationkey, step""")
  }

  test("ragged by-name union emits Spark's allowMissingColumns semantics") {
    import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Union}
    Tables.registerAll(spark, sfDir)
    val a = spark.sql("SELECT n_nationkey AS k, n_name AS name FROM nation")
    val b = spark.sql(
      "SELECT r_name AS name, r_regionkey AS k, 1 AS extra FROM region")
    // the DataFrame API's own result is the semantics to reproduce
    val expected = a.unionByName(b, allowMissingColumns = true)
    // build the ragged by-name node directly (the shape a transform
    // hands the emitter before any analyzer rewrite)
    val u = Union(Seq(a.queryExecution.analyzed, b.queryExecution.analyzed),
      byName = true, allowMissingCol = true)
    val emitted = SqlEmitter.toSql(u)
    assert(emitted.contains("NULL"), emitted) // typed null padding
    assert(sameResults(spark.sql(emitted), expected),
      s"ragged union diverged: $emitted")
    // DISTINCT over the same shape
    val emittedD = SqlEmitter.toSql(Distinct(u))
    assert(sameResults(spark.sql(emittedD), expected.distinct()), emittedD)
  }

  test("CTE defs stripped of their SubqueryAlias still emit (synthetic " +
      "names resolved at every reference site)") {
    import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, WithCTE}
    Tables.registerAll(spark, sfDir)
    val sql =
      """WITH big AS (SELECT o_custkey, sum(o_totalprice) AS t
                      FROM orders GROUP BY o_custkey)
         SELECT c_name, t FROM customer JOIN big ON c_custkey = o_custkey
         WHERE t > 100000 ORDER BY c_name"""
    val analyzed = QueryFacade(spark, sql).analyzed
    // a transform that rebuilds defs can drop the name-carrying alias
    val stripped = analyzed.transform {
      case w: WithCTE => w.copy(cteDefs = w.cteDefs.map(d =>
        d.child match {
          case SubqueryAlias(_, body) => d.copy(child = body)
          case _ => d
        }))
    }
    val emitted = SqlEmitter.toSql(stripped)
    assert(emitted.contains("__cte"), emitted)
    assert(sameResults(spark.sql(emitted), spark.sql(sql)),
      s"stripped-CTE round trip diverged: $emitted")
  }

  test("a hint inside an EXISTS subquery emits on the subquery block, " +
      "not the enclosing SELECT") {
    Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT n_name FROM nation
         WHERE EXISTS (SELECT /*+ BROADCAST(supplier) */ 1 FROM supplier
                       WHERE s_nationkey = n_nationkey)
         ORDER BY n_name"""
    val emitted = SqlEmitter.toSql(QueryFacade(spark, sql).analyzed)
    // the hint must sit inside the EXISTS block where its alias is
    // visible; on the outer block Spark drops it with a warning
    assert(emitted.matches("(?s).*EXISTS \\(SELECT /\\*\\+ BROADCAST.*"),
      emitted)
    assert(!emitted.matches("(?s)^SELECT /\\*\\+.*"), emitted)
    assert(sameResults(spark.sql(emitted), spark.sql(sql)), emitted)
  }

  test("every generated workload query round-trips through the emitter") {
    Tables.registerAll(spark, sfDir)
    val ceb = graft.bench.Ceb.generateWorkload(
      graft.bench.Ceb.templatesFromDirectory("/root/repo/workloads/ceb"),
      queriesPerTemplate = 4, seed = 20260812L)
    val walk = graft.bench.QueryGenerator
      .randomWalkWorkload("g02", n = 8, seed = 20260813L).queries.toSeq
    val spj = graft.bench.QueryGenerator
      .randomWorkload("fuzz", 20, seed = 4242L).queries.toSeq
    (ceb ++ walk ++ spj).foreach { case (label, sql) =>
      val emitted = SqlEmitter.toSql(QueryFacade(spark, sql).analyzed)
      assert(sameResults(spark.sql(emitted), spark.sql(sql)),
        s"$label diverged.\noriginal: $sql\nemitted:  $emitted")
    }
  }

  test("every JOB and SSB kit query round-trips through the emitter") {
    // the hand-written kits carry the shapes the generators don't:
    // HAVING, count-DISTINCT, OR-disjunctions, non-equi dim pairs,
    // triple self-joins, LIKE chains
    Tables.registerAll(spark, sfDir)
    val kits = graft.bench.Workload
      .fromDirectory("job", "/root/repo/workloads/job").queries.toSeq ++
      graft.bench.Workload
        .fromDirectory("ssb", "/root/repo/workloads/ssb").queries.toSeq
    assert(kits.size === 126) // 113 JOB (34 hand-built + 79 generated) + 13 SSB
    kits.foreach { case (label, sql) =>
      val emitted = SqlEmitter.toSql(QueryFacade(spark, sql).analyzed)
      assert(sameResults(spark.sql(emitted), spark.sql(sql)),
        s"$label diverged.\noriginal: $sql\nemitted:  $emitted")
    }
  }

  test("uncovered nodes are rejected, not mis-emitted") {
    Tables.registerAll(spark, sfDir)
    // posexplode yields TWO generator columns — not expressible as one
    // inline SELECT item, must fail loudly
    val generated = QueryFacade(spark,
      "SELECT posexplode(array(1, 2)) FROM supplier").analyzed
    assertThrows[UnsupportedOperationException](SqlEmitter.toSql(generated))
  }
}
