package graft

import graft.opt.{CatalogSystemR, JoinGraph}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** System-R estimation over Spark's own ANALYZE'd catalog statistics —
  * the bench's "native" estimator head-to-head column: base row counts
  * and ndv from `ANALYZE ... FOR ALL COLUMNS`, Selinger independence
  * defaults for filters, 1/max(ndv) per equi-join edge. */
class CatalogSystemRSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private def qerror(est: Double, actual: Double): Double = {
    val e = math.max(est, 1.0); val a = math.max(actual, 1.0)
    math.max(e / a, a / e)
  }

  /** ANALYZE'd-catalog window over `tables` (mirrors the bench's):
    * create + ANALYZE, capture, drop, re-register temp views. */
  private def captured(tables: Seq[String])
      : Map[String, CatalogSystemR.TableStats] = {
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$sfDir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    try CatalogSystemR.capture(spark, tables)
    finally {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Tables.registerAll(spark, sfDir)
    }
  }

  test("pk-fk equi-join + equality filter track the textbook estimate " +
      "over catalog rowCount/ndv (aliases resolve to real names)") {
    Tables.registerAll(spark, sfDir)
    val snap = captured(Seq("customer", "nation"))
    assert(snap.contains("customer") && snap.contains("nation"))
    val custRows = spark.table("customer").count().toDouble
    assert(snap("customer").rowCount.toDouble === custRows)
    val sysR = new CatalogSystemR(snap)

    // |C ⋈ N| = |C|·|N| / max(ndv) = |C| for a key join — exact here
    val joinSql = """SELECT count(*) AS n FROM customer c, nation n
                     WHERE c.c_nationkey = n.n_nationkey"""
    val qj = QueryFacade(spark, joinSql)
    val gj = new JoinGraph(qj.joinBlock.get, stats)
    val estJ = sysR.estimate(gj, Set("c", "n")).get
    val actJ = spark.sql(joinSql).head().getLong(0).toDouble
    assert(qerror(estJ, actJ) < 1.5, s"join est=$estJ actual=$actJ")

    // + equality filter: 1/ndv(c_mktsegment) — near-uniform segment
    val filtSql = """SELECT count(*) AS n FROM customer, nation
                     WHERE c_nationkey = n_nationkey
                       AND c_mktsegment = 'BUILDING'"""
    val qf = QueryFacade(spark, filtSql)
    val gf = new JoinGraph(qf.joinBlock.get, stats)
    val estF = sysR.estimate(gf, Set("customer", "nation")).get
    val actF = spark.sql(filtSql).head().getLong(0).toDouble
    assert(qerror(estF, actF) < 2.0, s"filtered est=$estF actual=$actF")
    assert(estF < estJ, "the equality filter must reduce the estimate")
  }

  test("a table outside the ANALYZE window yields None (the caller's " +
      "size-fallback provenance case)") {
    Tables.registerAll(spark, sfDir)
    val snap = captured(Seq("nation")) // region deliberately not captured
    val sql = """SELECT count(*) AS n FROM nation, region
                 WHERE n_regionkey = r_regionkey"""
    val q = QueryFacade(spark, sql)
    val g = new JoinGraph(q.joinBlock.get, stats)
    assert(new CatalogSystemR(snap)
      .estimate(g, Set("nation", "region")).isEmpty)
    // the captured side alone still estimates
    assert(new CatalogSystemR(snap).estimate(g, Set("nation")).isDefined)
  }
}
