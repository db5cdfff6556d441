package graft

import graft.bench.Ceb
import graft.opt.{UESJoinOrderOptimizer, UESOperatorSelection}
import graft.pipeline.MultiStageOptimizationPipeline
import graft.stats.EmulatedStatistics

/** CEB template-driven query generation (reference:
  * /root/reference/postbound/experiments/ceb.py): determinism, sampling
  * semantics (uniform vs weighted, IN bounds, LIKE escaping), sql-typed
  * candidate predicates with dependencies, and the central invariant —
  * every generated query returns identical results through the UES
  * pipeline and native Spark.
  */
class CebSpec extends SparkSpec {

  private def gateTemplates = Ceb.templatesFromDirectory(
    sys.props.getOrElse("graft.workloads.dir", "/root/repo/workloads") + "/ceb")

  test("workload generation is deterministic per seed and unique per label") {
    val a = Ceb.generateWorkload(gateTemplates, 4, seed = 20260812L)
    val b = Ceb.generateWorkload(gateTemplates, 4, seed = 20260812L)
    assert(a === b)
    assert(a.size === 12)
    assert(a.map(_._2).distinct.size === 12, "queries must be unique")
    assert(a.map(_._1) === a.map(_._1).distinct)
    val c = Ceb.generateWorkload(gateTemplates, 4, seed = 1L)
    assert(a.map(_._2) !== c.map(_._2), "different seed, different workload")
  }

  test("IN predicates respect min/max samples; LIKE values get wildcards") {
    // 10 per template: template 3 has only 5x4 = 20 possible combinations,
    // so far larger requests exhaust the space (correctly raising
    // SamplingError — the reference behaves the same way)
    val wl = Ceb.generateWorkload(gateTemplates, 10, seed = 7L)
    val inSizes = wl.map(_._2).filter(_.contains(" IN "))
      .map(q => q.substring(q.indexOf(" IN (") + 4))
      .map(s => s.substring(0, s.indexOf(')')).split(",").length)
    assert(inSizes.nonEmpty)
    assert(inSizes.forall(n => n >= 2 && n <= 3), s"IN sizes: $inSizes")
    val likes = wl.map(_._2).filter(_.contains("LIKE"))
    assert(likes.nonEmpty)
    assert(likes.forall(_.matches("(?s).*LIKE '%[a-z]+%'.*")), likes.head)
  }

  test("weighted sampling biases draws by weight; uniform dedupes candidates") {
    val weighted = Ceb.Predicate("seg", Seq("seg"), "list", "weighted",
      Seq("="), Seq("c.seg"),
      options = Seq(Seq("A", 9L), Seq("B", 1L)), countColumnIdx = Some(2))
    val uniform = Ceb.Predicate("u", Seq("u"), "list", "uniform",
      Seq("="), Seq("c.u"),
      // duplicates must NOT bias a uniform draw
      options = Seq(Seq("X"), Seq("X"), Seq("X"), Seq("X"), Seq("Y")))
    val t = new Ceb.Template("t", "SELECT <<seg>> AS s, <<u>> AS u",
      Seq(weighted, uniform))
    val rnd = new java.util.Random(5L)
    val draws = (1 to 400).map(_ => t.generateRawQuery(rnd))
    val aFrac = draws.count(_.contains("'A'")).toDouble / draws.size
    assert(aFrac > 0.8 && aFrac < 0.98, s"9:1 weighting drew A at $aFrac")
    val xFrac = draws.count(_.contains("'X'")).toDouble / draws.size
    assert(xFrac > 0.35 && xFrac < 0.65,
      s"uniform draw over {X (4 dups), Y} picked X at $xFrac — dedup broken")
  }

  test("sql-typed predicates fetch candidates live and honor dependencies") {
    Tables.registerAll(spark, sfDir)
    def run(sql: String): Seq[Seq[Any]] =
      spark.sql(sql).collect().toSeq.map(_.toSeq)
    val region = Ceb.Predicate("region", Seq("region"), "list", "uniform",
      Seq("="), Seq("nation.n_regionkey"), options = Seq(Seq(0L), Seq(2L)))
    // candidate query references the region chosen above
    val nation = Ceb.Predicate("nation", Seq("nation"), "sql", "uniform",
      Seq("="), Seq("nation.n_name"),
      sqlQuery = Some("SELECT n_name FROM nation " +
        "WHERE n_regionkey = <<region>> ORDER BY n_name"),
      dependencies = Seq("region"))
    val t = new Ceb.Template("dep",
      """SELECT CAST(count(*) AS BIGINT) AS n
         FROM nation WHERE n_regionkey = <<region>> AND n_name = <<nation>>""",
      Seq(region, nation), candidateSql = run)
    val rnd = new java.util.Random(11L)
    (1 to 5).foreach { _ =>
      val q = t.generateRawQuery(rnd)
      // the drawn nation really belongs to the drawn region: count = 1
      assert(spark.sql(q).head().getLong(0) === 1L, q)
    }
  }

  test("20 generated queries: optimized results equal native results " +
      "(the g01 invariant, wider sweep)") {
    Tables.registerAll(spark, sfDir)
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = new EmulatedStatistics(spark))
    val wl = Ceb.generateWorkload(gateTemplates, 7, seed = 99L).take(20)
    assert(wl.size === 20)
    wl.foreach { case (label, sql) =>
      assert(sameResults(pipeline.optimize(sql), spark.sql(sql)),
        s"$label differs: $sql")
    }
  }

  test("persisted workload round-trips through the kit loader") {
    val wl = Ceb.generateWorkload(gateTemplates, 3, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("graft_cebwl").toString
    Ceb.persistWorkload(dir, wl)
    val loaded = graft.bench.Workload.fromDirectory("gen", dir)
    assert(loaded.queries.size === wl.size)
    wl.foreach { case (label, sql) =>
      assert(loaded.queries(label).trim === sql.trim, label)
    }
  }

  test("template YAML parsing round-trips structure and rejects garbage") {
    val t = gateTemplates.head
    assert(t.label === "ceb-spj-orders")
    assert(t.predicates.map(_.name).toSet === Set("segment", "price_cap",
      "regions"))
    assert(t.predicates.find(_.name == "regions").get.inMaxSamples
      === Some(3))
    assertThrows[IllegalArgumentException](new Ceb.Template("bad", "SELECT 1",
      Seq(Ceb.Predicate("p", Seq("a", "b"), "list", "uniform",
        Seq("IN", "="), Seq("x", "y"), options = Seq(Seq(1L))))))
    // dependency cycles must be detected
    val pa = Ceb.Predicate("a", Seq("a"), "list", "uniform", Seq("="),
      Seq("x"), options = Seq(Seq(1L)), dependencies = Seq("b"))
    val pb = Ceb.Predicate("b", Seq("b"), "list", "uniform", Seq("="),
      Seq("y"), options = Seq(Seq(2L)), dependencies = Seq("a"))
    assertThrows[IllegalArgumentException](
      new Ceb.Template("cyc", "SELECT 1", Seq(pa, pb)))
  }
}
