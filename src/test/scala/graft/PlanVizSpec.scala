package graft

import graft.opt.{JoinGraph, QepSynopsis}
import graft.core.JoinOperator
import graft.plans.{JoinTree, PlanViz}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** Text renderers (vis analog): DOT/ASCII output must be parseable and
  * carry the plan's structure and annotations. */
class PlanVizSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private def graphFor(sql: String) = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark, sql)
    (q, new JoinGraph(q.joinBlock.get, stats))
  }

  test("join tree DOT and ASCII carry every table and cardinality") {
    val (q, graph) = graphFor(
      """SELECT count(*) AS n FROM nation, supplier
         WHERE n_nationkey = s_nationkey""")
    val tree = JoinTree.leftDeep(q.joinBlock.get.tables)
      .map(_ => graft.core.Cardinality(25))
    val dot = PlanViz.dotJoinTree(tree)
    assert(dot.startsWith("graph JoinTree {"))
    assert(dot.contains("nation") && dot.contains("supplier"))
    assert(dot.contains("card=25"))
    // one undirected edge per parent-child link: 2 for a single join
    assert(dot.linesIterator.count(_.contains("--")) === 2)
    val ascii = PlanViz.asciiJoinTree(tree)
    assert(ascii.linesIterator.size === 3)
    assert(ascii.linesIterator.next().startsWith("JOIN"))
  }

  test("join graph DOT points fk -> pk and labels predicates") {
    val (_, graph) = graphFor(
      """SELECT count(*) AS n FROM nation, supplier
         WHERE n_nationkey = s_nationkey""")
    val dot = PlanViz.dotJoinGraph(graph)
    assert(dot.startsWith("digraph JoinGraph {"))
    // nation holds the pk side of the edge: arrow must point INTO nation
    assert(dot.contains("\"supplier\" -> \"nation\""), dot)
    assert(dot.toLowerCase.contains("nationkey"))
  }

  test("physical plan DOT shows actual row counts after execution") {
    Tables.registerAll(spark, sfDir)
    val df = spark.sql("SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
    df.collect()
    val dot = PlanViz.dotPhysicalPlan(df)
    assert(dot.startsWith("digraph PhysicalPlan {"))
    assert(dot.contains("HashAggregate"))
    // the aggregate output of 5 regions must appear as an actual
    assert(dot.contains("rows=5"), dot)
  }

  test("TONIC trie ASCII lists prefixes with observed costs") {
    val syn = new QepSynopsis
    syn.recordCost(Seq("nation", "supplier"), JoinOperator.HashJoin, 3.0)
    syn.recordCost(Seq("nation", "supplier"), JoinOperator.SortMergeJoin, 9.5)
    val out = PlanViz.asciiTonic(syn)
    assert(out.linesIterator.next() === "QEP-S")
    assert(out.contains("nation"))
    assert(out.contains("supplier {hash_join=3.0, sort_merge_join=9.5}") ||
      out.contains("supplier {"), out)
  }
}
