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

  test("force-directed layout is deterministic and pulls joined tables " +
      "together") {
    import graft.vis.Vis
    val nodes = Seq("a", "b", "c", "d", "e", "f")
    // two cliques {a,b,c} and {d,e,f} with no cross edges
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"))
    val l1 = Vis.forceDirectedLayout(nodes, edges, seed = 7L)
    val l2 = Vis.forceDirectedLayout(nodes, edges, seed = 7L)
    assert(l1 === l2, "layout not deterministic")
    def dist(p: (Double, Double), q: (Double, Double)) =
      math.hypot(p._1 - q._1, p._2 - q._2)
    val intra = for {
      (x, y) <- edges
    } yield dist(l1(x), l1(y))
    val inter = for {
      x <- Seq("a", "b", "c"); y <- Seq("d", "e", "f")
    } yield dist(l1(x), l1(y))
    assert(intra.sum / intra.size < inter.sum / inter.size,
      s"clique members not closer than cross-clique pairs: $l1")
  }

  test("join graph SVG renders every table, FK orientation, and is " +
      "well-formed XML") {
    val (_, graph) = graphFor(
      """SELECT count(*) AS n FROM nation, supplier, customer
         WHERE n_nationkey = s_nationkey AND n_nationkey = c_nationkey""")
    val svg = graft.vis.Vis.svgJoinGraph(graph)
    Seq("nation", "supplier", "customer").foreach(t =>
      assert(svg.contains(s">$t</text>"), s"missing label $t"))
    assert(svg.contains("marker-end"), "FK edges must carry the arrowhead")
    // well-formedness: the JDK parser must accept it as-is
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        svg.getBytes("UTF-8")))
  }

  test("result grid SVG has one cell per label and marks failures") {
    import graft.bench.ExecutionResult
    val rs = Seq(
      ExecutionResult("q1", "ok", 1.0, 5.0, 10L, "", 1, 1),
      ExecutionResult("q1", "ok", 2.0, 5.0, 10L, "", 1, 2),
      ExecutionResult("q2", "ok", 0.5, 3.0, 4L, "", 1, 1),
      ExecutionResult("q3", "timeout", -1.0, 3.0, -1L, "limit", 1, 1))
    val svg = graft.vis.Vis.svgResultGrid(rs)
    Seq("q1", "q2", "q3").foreach(l => assert(svg.contains(s">$l</text>")))
    assert(svg.contains("stroke-dasharray"), "failed rep not marked")
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  test("TONIC trie SVG is deterministic, well-formed, and carries every " +
      "prefix with its learned costs") {
    val syn = new QepSynopsis
    syn.recordCost(Seq("nation", "supplier"), JoinOperator.HashJoin, 3.0)
    syn.recordCost(Seq("nation", "supplier"), JoinOperator.SortMergeJoin, 9.5)
    syn.recordCost(Seq("nation", "customer"), JoinOperator.HashJoin, 7.0)
    syn.recordCost(Seq("nation", "customer", "orders"),
      JoinOperator.IndexNestedLoopJoin, 1.5)
    val svg = graft.vis.Vis.svgTonicTrie(syn)
    assert(svg === graft.vis.Vis.svgTonicTrie(syn), "not deterministic")
    Seq("∅", "nation", "supplier", "customer", "orders").foreach(t =>
      assert(svg.contains(s">$t</text>"), s"missing trie node $t"))
    assert(svg.contains("HashJoin=3.0") && svg.contains("SortMergeJoin=9.5"),
      "per-operator costs missing from node label")
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  test("optimizer stage SVG shows join graph, join order, and physical " +
      "assignment panels") {
    import graft.core.Cardinality
    import graft.plans.{PhysicalOperatorAssignment, PlanParameterization}
    val (q, graph) = graphFor(
      """SELECT count(*) AS n FROM nation, supplier, customer
         WHERE n_nationkey = s_nationkey AND n_nationkey = c_nationkey""")
    val tree = JoinTree.leftDeep(q.joinBlock.get.tables)
      .map(_ => Cardinality(25))
    val result = graft.pipeline.OptimizationResult(
      df = spark.range(1).toDF(),
      joinOrder = Some(tree),
      operators = PhysicalOperatorAssignment()
        .withJoin(Set("nation", "supplier"), JoinOperator.HashJoin),
      parameters = PlanParameterization(cardinalityHints =
        Map(Set("nation", "supplier") -> Cardinality(40))),
      usedNativeFallback = false,
      describe = "spec")
    val svg = graft.vis.Vis.svgOptimizerStages(graph, result)
    assert(svg === graft.vis.Vis.svgOptimizerStages(graph, result),
      "not deterministic")
    Seq("1 · join graph", "2 · join order", "3 · physical operators")
      .foreach(t => assert(svg.contains(t), s"missing panel title $t"))
    assert(svg.contains("card=25"), "estimated cardinality missing")
    assert(svg.contains("HashJoin"), "assigned operator missing")
    assert(svg.contains("hint=40"), "cardinality hint missing")
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
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
