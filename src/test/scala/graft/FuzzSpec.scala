package graft

import graft.bench.QueryGenerator
import graft.opt.{Presets, UESJoinOrderOptimizer, UESOperatorSelection}
import graft.pipeline.MultiStageOptimizationPipeline
import graft.stats.EmulatedStatistics

/** Fuzz the optimizer: randomly generated SPJ queries must return identical
  * results through the UES pipeline and native Spark — the reference's core
  * invariant, checked over a random workload instead of fixed queries.
  */
class FuzzSpec extends SparkSpec {

  test("20 random queries: optimized results equal native results") {
    Tables.registerAll(spark, sfDir)
    val stats = new EmulatedStatistics(spark)
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = stats)
    // GRAFT_FUZZ_N widens the sweep for one-off deep fuzzing runs
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(20)
    val wl = QueryGenerator.randomWorkload("fuzz", n, seed = 4242L)
    var enforced = 0
    wl.queries.foreach { case (label, sql) =>
      val res = pipeline.optimizeQuery(sql)
      if (!res.usedNativeFallback) enforced += 1
      assert(sameResults(res.df, spark.sql(sql)), s"$label differs: $sql")
    }
    // most generated queries must actually exercise enforcement
    assert(enforced >= (n * 3) / 4, s"only $enforced of $n queries were enforced")
  }

  test("generator is deterministic per seed") {
    assert(QueryGenerator.randomQuery(7L) === QueryGenerator.randomQuery(7L))
    assert(QueryGenerator.randomQuery(7L) !== QueryGenerator.randomQuery(8L))
  }

  test("random queries through the DP preset also match native") {
    Tables.registerAll(spark, sfDir)
    val pipeline = Presets.dynprog(spark)
    QueryGenerator.randomWorkload("fuzzdp", 5, seed = 99L).queries.foreach {
      case (label, sql) =>
        val res = pipeline.optimizeQuery(sql)
        assert(sameResults(res.df, spark.sql(sql)), s"$label differs: $sql")
    }
  }

  test("FK random walk yields connected prefixes and all-pairs FK joins") {
    val rnd = new scala.util.Random(13L)
    (1 to 20).foreach { _ =>
      val n = 2 + rnd.nextInt(5)
      val tables = QueryGenerator.randomWalkTables(
        new scala.util.Random(rnd.nextLong()), n)
      assert(tables.size === n)
      assert(tables.distinct.size === n, "walk revisited a table")
      // connectivity: every prefix must touch the FK graph of the prior
      // prefix (the shell-jump invariant)
      (2 to n).foreach { k =>
        val prefix = tables.take(k).toSet
        val joins = QueryGenerator.fkJoinPredicates(tables.take(k))
        assert(joins.nonEmpty, s"disconnected prefix $prefix")
      }
      // all-pairs: every FK-connected pair among the tables has exactly
      // one predicate
      val expected = (for {
        i <- tables.indices; j <- (i + 1) until tables.size
        if QueryGenerator.schemaEdges.exists(e =>
          Set(e._1, e._3) == Set(tables(i), tables(j)))
      } yield 1).size
      assert(QueryGenerator.fkJoinPredicates(tables).size === expected)
    }
  }

  test("FK-walk generator is deterministic and executes under UES with " +
      "native parity") {
    Tables.registerAll(spark, sfDir)
    assert(QueryGenerator.randomWalkQuery(5L)
      === QueryGenerator.randomWalkQuery(5L))
    val stats = new EmulatedStatistics(spark)
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = stats)
    QueryGenerator.randomWalkWorkload("walkfuzz", 6, seed = 777L)
      .queries.foreach { case (label, sql) =>
        val res = pipeline.optimizeQuery(sql)
        assert(sameResults(res.df, spark.sql(sql)), s"$label differs: $sql")
      }
  }

  test("live distinct-value sampling renders executable literals") {
    Tables.registerAll(spark, sfDir)
    val live = new QueryGenerator.DataValueSource(spark, sfDir)
    // the live route must agree with the static fixture domains on a
    // categorical column (the premise that lets the gate's oracle be
    // assembled without a session)
    assert(live.distinctValues("orders", "o_orderstatus")
      === QueryGenerator.FixtureValueSource
        .distinctValues("orders", "o_orderstatus").sorted)
    val sql = QueryGenerator.randomWalkQuery(31L, values = live)
    assert(spark.sql(sql).count() === 1L) // count-star query runs
  }
}
