package graft

import org.apache.spark.sql.functions._
import graft.opt.{TonicOperatorSelection, UESJoinOrderOptimizer, UESOperatorSelection}
import graft.pipeline.MultiStageOptimizationPipeline
import graft.stats.EmulatedStatistics
import graft.train._

/** Training-data repository (reference: postbound/train/_train.py):
  * spec/violation semantics, conform/merge, parquet persistence, and the
  * warm-start contract — a corpus harvested from executed plans, persisted,
  * and reloaded into a FRESH trie must make TONIC recommend without any
  * re-learning, and steering from it must preserve answers.
  */
class TrainingRepoSpec extends SparkSpec {

  private val flagshipSql =
    """SELECT n_name, count(*) AS order_cnt
       FROM customer, orders, nation
       WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  test("spec satisfaction reports missing features") {
    val provider = TrainingSpec(Seq("query", "cardinality", "runtime_ms"))
    val need = TrainingSpec(Seq("cardinality", "query"))
    assert(provider.satisfies(need) === Seq.empty)
    assert(provider.provides(Seq("query", "runtime_ms")))
    val needMore = TrainingSpec(Seq("query", "query_plan"))
    assert(provider.satisfies(needMore) === Seq("query_plan"))
  }

  test("conformTo renames/reorders via the feature map; merge unions " +
      "shared features") {
    import spark.implicits._
    val a = new TrainingData(
      Seq(("q1", 10L)).toDF("sql_text", "rows"),
      Map("query" -> "sql_text", "cardinality" -> "rows"))
    val conformed = a.conformTo(TrainingSpec(Seq("cardinality", "query")))
    assert(conformed.samples.columns.toSeq === Seq("cardinality", "query"))
    val b = TrainingData.fromDf(
      Seq(("q2", 20L, 5.0)).toDF("query", "cardinality", "runtime_ms"))
    val merged = a.mergeWith(b)
    assert(merged.count() === 2)
    assert(merged.spec.featureSet === Set("query", "cardinality"))
    assertThrows[IllegalArgumentException](
      a.conformTo(TrainingSpec(Seq("query_plan"))))
  }

  test("repository round-trips datasets through parquet and retrieves " +
      "by spec") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_trainrepo")
      .toString
    val d1 = TrainingData.fromDf(
      Seq(("q1", 10L)).toDF("query", "cardinality"))
    val d2 = TrainingData.fromDf(
      Seq(("q2", 20L, 1.5)).toDF("query", "cardinality", "runtime_ms"))
    new TrainingDataRepository(spark, root)
      .register("a_first", d1).register("b_second", d2)
    // FRESH repository over the same root: persistence is the state
    val repo = new TrainingDataRepository(spark, root)
    assert(repo.datasets.size === 2)
    val spec = TrainingSpec(Seq("query", "cardinality"))
    assert(repo.retrieveAll(spec).size === 2)
    assert(repo.retrieveMerged(spec).get.count() === 2)
    assert(repo.retrieveFirst(TrainingSpec(Seq("runtime_ms"))).get.count() === 1)
    assert(repo.retrieveFirst(TrainingSpec(Seq("no_such_feature"))).isEmpty)
  }

  test("warm start: persisted samples make a FRESH trie recommend without " +
      "re-learning, and steering preserves answers") {
    Tables.registerAll(spark, sfDir)
    val executed = spark.sql(flagshipSql)
    val expected = executed.collect()
    val data = TrainingHarvest.fromExecution(spark, "flagship", flagshipSql,
      executed, runtimeMs = 12.5).get
    assert(data.count() >= 2, "flagship has >= 2 joins to harvest")
    assert(data.satisfies(TrainingHarvest.tonicSpec).isEmpty)

    val root = java.nio.file.Files.createTempDirectory("graft_trainws")
      .toString
    new TrainingDataRepository(spark, root).register("flagship", data)

    // fresh repository + fresh synopsis: no shared in-memory state
    val corpus = new TrainingDataRepository(spark, root)
      .retrieveMerged(TrainingHarvest.tonicSpec).get
    val synopsis = TrainingHarvest.warmStartTonic(corpus)
    assert(synopsis.size > 1, "trie must contain replayed paths")
    // the trie recommends for at least one harvested prefix WITHOUT any
    // learnFromFeedback/learnFromExecution call in this "JVM"
    val paths = corpus.samples.collect()
      .map(_.getString(corpus.samples.columns.indexOf("join_path")))
    assert(paths.exists(p => synopsis.recommend(p.split(' ').toSeq).nonEmpty),
      s"no recommendation for any of ${paths.toSeq}")

    val steered = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new TonicOperatorSelection(synopsis)),
      stats = new EmulatedStatistics(spark)).optimize(flagshipSql)
    assert(steered.collect() === expected)
  }

  test("cardinality lookup feeds precomputed-cardinality estimation") {
    Tables.registerAll(spark, sfDir)
    val executed = spark.sql(flagshipSql)
    executed.collect()
    val data = TrainingHarvest.fromExecution(spark, "flagship", flagshipSql,
      executed, runtimeMs = 0.0).get
    val lookup = TrainingHarvest.cardinalityLookup(data)
    assert(lookup.nonEmpty)
    // every intermediate is a multi-table set with a real observed count
    assert(lookup.keys.forall(_.size >= 2))
    assert(lookup.values.forall(c => c.isValid && c.value >= 0))
    val est = new graft.opt.PreComputedCardinalities(lookup)
    assert(est.describe.contains("precomputed"))
  }
}
