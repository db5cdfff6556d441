package graft

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Sort}
import graft.qal.QueryFacade
import graft.transforms.{AugmentEquiJoinPredicates, Transforms}

class TransformsSpec extends SparkSpec {

  private def plan(sql: String) = {
    Tables.registerAll(spark, sfDir)
    QueryFacade(spark, sql).analyzed
  }

  test("asCountStar produces the row count of the underlying plan") {
    val p = plan("SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0")
    val n = GraftShims.ofRows(spark, Transforms.asCountStar(p)).head().getLong(0)
    val expected = GraftShims.ofRows(spark, p).count()
    assert(n === expected)
  }

  test("dropOrderBy strips root sorts, dropLimit strips limits") {
    val p = plan("SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 5")
    val noLimit = Transforms.dropLimit(p)
    val noSort = Transforms.dropOrderBy(noLimit)
    assert(!noSort.isInstanceOf[Sort])
    assert(GraftShims.ofRows(spark, noSort).count() ===
      Tables.load(spark, sfDir, "customer").count())
  }

  test("removePredicate drops exactly one conjunct") {
    val p = plan("SELECT count(*) AS n FROM customer WHERE c_acctbal > 0 AND c_custkey > 10")
    val filterCond = p.collectFirst { case Filter(c, _) => c }.get
    val one = Transforms.splitConjuncts(filterCond).head
    val without = Transforms.removePredicate(p, one)
    val remaining = without.collectFirst { case Filter(c, _) =>
      Transforms.splitConjuncts(c) }.get
    assert(remaining.size === 1)
  }

  test("replaceExpressions swaps an expression by semantic equality") {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, Literal}
    val p = plan("SELECT c_custkey FROM customer WHERE c_acctbal > 50")
    val bound = p.collectFirst {
      case Filter(GreaterThan(_, r), _) => r
    }.get
    val swapped = Transforms.replaceExpressions(p, bound, Literal(5000.0))
    val n = GraftShims.ofRows(spark, swapped).count()
    val expected = Tables.load(spark, sfDir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 5000.0).count()
    assert(n === expected)
    assert(n !== GraftShims.ofRows(spark, p).count())
  }

  test("renameOutput and renameTable rewrap the plan") {
    val p = plan("SELECT c_custkey FROM customer")
    val renamed = Transforms.renameTable(
      Transforms.renameOutput(p, "c_custkey", "id"), "c2")
    val df = GraftShims.ofRows(spark, renamed)
    assert(df.columns.toSeq === Seq("id"))
    assert(df.count() === Tables.load(spark, sfDir, "customer").count())
  }

  test("query fragment over a table subset counts like the sub-join") {
    Tables.registerAll(spark, sfDir)
    val q = graft.qal.QueryFacade(spark,
      """SELECT count(*) AS n FROM nation, supplier, region
         WHERE n_nationkey = s_nationkey AND n_regionkey = r_regionkey""")
    val graph = new graft.opt.JoinGraph(q.joinBlock.get,
      new graft.stats.EmulatedStatistics(spark))
    val frag = graft.opt.QueryFragment.fragmentPlan(graph,
      Set("nation", "supplier"))
    val n = GraftShims.ofRows(spark, frag).count()
    val expected = spark.sql(
      """SELECT count(*) FROM nation, supplier
         WHERE n_nationkey = s_nationkey""").head().getLong(0)
    assert(n === expected)
  }

  private def threeTableFacade = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark,
      """SELECT count(*) AS n FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey""")
    val block = q.joinBlock.get
    val attrToTable = block.tables.map(_.identifier).flatMap(t =>
      block.leafPlan(t).output.map(_.exprId -> t)).toMap
    (q, block, attrToTable)
  }

  test("moveIntoSubquery wraps exactly the targeted sub-join") {
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    val (q, _, attrToTable) = threeTableFacade
    val p = q.analyzed
    val moved = Transforms.moveIntoSubquery(
      p, Set("customer", "orders"), "co", attrToTable)
    assert(moved.collect {
      case s: SubqueryAlias if s.alias == "co" => s
    }.nonEmpty, moved.toString)
    assert(sameResults(GraftShims.ofRows(spark, moved),
      GraftShims.ofRows(spark, p)))
  }

  test("mergeTables substitutes a replacement relation for the sub-join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, SubqueryAlias}
    val (q, block, attrToTable) = threeTableFacade
    val p = q.analyzed
    val subtree = p.collect { case j: Join => j }.find(j =>
      j.collectLeaves().flatMap(_.output.flatMap(a =>
        attrToTable.get(a.exprId))).toSet == Set("customer", "orders")).get
    val merged = Transforms.mergeTables(p, Set("customer", "orders"),
      SubqueryAlias("merged", subtree), attrToTable)
    assert(merged.collect {
      case s: SubqueryAlias if s.alias == "merged" => s
    }.nonEmpty, merged.toString)
    assert(sameResults(GraftShims.ofRows(spark, merged),
      GraftShims.ofRows(spark, p)))
  }

  test("expandToQuery turns a join predicate into a runnable query") {
    val (q, block, _) = threeTableFacade
    val graph = new graft.opt.JoinGraph(block,
      new graft.stats.EmulatedStatistics(spark))
    val edge = graph.edges.find(_.tables == Set("customer", "orders")).get
    val expanded = Transforms.expandToQuery(edge.expr,
      Seq(block.leafPlan("customer"), block.leafPlan("orders")))
    val n = GraftShims.ofRows(spark, expanded).count()
    val expected = spark.sql(
      """SELECT count(*) FROM customer, orders
         WHERE c_custkey = o_custkey""").head().getLong(0)
    assert(n === expected)
  }

  test("decompose/compose round-trips a full query block unchanged") {
    val p = plan(
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE c_acctbal > 0 GROUP BY c_mktsegment HAVING count(*) > 1
         ORDER BY c_mktsegment LIMIT 3""")
    val c = Transforms.decompose(p)
    assert(c.limit.nonEmpty && c.orderBy.nonEmpty && c.having.nonEmpty
      && c.groupBy.nonEmpty && c.where.nonEmpty)
    assert(sameResults(GraftShims.ofRows(spark, Transforms.compose(c)),
      GraftShims.ofRows(spark, p)))
  }

  test("replaceSelectList rewrites the SELECT list of a plain block") {
    import org.apache.spark.sql.catalyst.expressions.Alias
    val p = plan("SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0")
    val keyAttr = p.output.head
    val replaced = Transforms.replaceSelectList(p,
      Seq(Alias(keyAttr, "id")()))
    val df = GraftShims.ofRows(spark, replaced)
    assert(df.columns.toSeq === Seq("id"))
    assert(df.count() === GraftShims.ofRows(spark, p).count())
  }

  test("replaceSelectList rewrites the aggregate list of a grouped block") {
    val p = plan(
      """SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment""")
    val c = Transforms.decompose(p)
    val (keys, aggs) = c.groupBy.get
    // keep only the grouping column — SELECT c_mktsegment ... GROUP BY ...
    val replaced = Transforms.replaceSelectList(p, Seq(
      aggs.head))
    val df = GraftShims.ofRows(spark, replaced)
    assert(df.columns.toSeq === Seq(aggs.head.name))
    assert(df.count() === GraftShims.ofRows(spark, p).count())
  }

  test("addGroupBy turns a plain block into a grouped aggregate") {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val p = plan("SELECT c_mktsegment, c_custkey FROM customer WHERE c_acctbal > 0")
    val seg = p.output.head
    val cnt = Alias(AggregateExpression(Count(Literal(1)), Complete,
      isDistinct = false), "n")()
    val grouped = Transforms.addGroupBy(p, Seq(seg), Seq(seg, cnt))
    assert(sameResults(GraftShims.ofRows(spark, grouped),
      spark.sql("""SELECT c_mktsegment, count(*) AS n FROM customer
                   WHERE c_acctbal > 0 GROUP BY c_mktsegment""")))
  }

  test("dropGroupBy collapses a grouped block to the scalar aggregate") {
    val p = plan(
      """SELECT c_mktsegment, count(*) AS n FROM customer
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    val dropped = Transforms.dropGroupBy(p)
    val df = GraftShims.ofRows(spark, dropped)
    assert(df.columns.toSeq === Seq("n"))
    assert(df.head().getLong(0) ===
      Tables.load(spark, sfDir, "customer").count())
  }

  test("addWhere conjoins and dropWhere removes the filter clause") {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, Literal}
    val p = plan("SELECT c_custkey FROM customer WHERE c_acctbal > 0")
    val key = p.collectFirst { case Filter(_, ch) => ch }.get.output
      .find(_.name == "c_custkey").get
    val narrowed = Transforms.addWhere(p, GreaterThan(key, Literal(100L)))
    val widened = Transforms.dropWhere(p)
    val base = GraftShims.ofRows(spark, p).count()
    assert(GraftShims.ofRows(spark, narrowed).count() < base)
    assert(GraftShims.ofRows(spark, widened).count() >=
      base)
    assert(GraftShims.ofRows(spark, widened).count() ===
      Tables.load(spark, sfDir, "customer").count())
  }

  test("dropHints strips ResolvedHint wrappers and join hints") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, ResolvedHint}
    Tables.registerAll(spark, sfDir)
    val p = spark.sql(
      """SELECT /*+ BROADCAST(nation), MERGEJOIN(supplier) */ s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""")
      .queryExecution.analyzed
    assert(p.collect { case r: ResolvedHint => r }.nonEmpty ||
      p.collect { case j: Join if j.hint != JoinHint.NONE => j }.nonEmpty)
    val stripped = Transforms.dropHints(p)
    assert(stripped.collect { case r: ResolvedHint => r }.isEmpty)
    assert(stripped.collect {
      case j: Join if j.hint != JoinHint.NONE => j }.isEmpty)
    assert(sameResults(GraftShims.ofRows(spark, stripped),
      GraftShims.ofRows(spark, p)))
  }

  test("equality closure adds the transitive edge") {
    val p = plan(
      """SELECT count(*) AS n FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND o_custkey = l_orderkey""")
    val augmented = AugmentEquiJoinPredicates(p)
    val conjuncts = augmented.collectFirst { case Filter(c, _) =>
      Transforms.splitConjuncts(c) }.get
    assert(conjuncts.size === 3, s"expected augmented edge, got: $conjuncts")
    // results unchanged by the augmentation
    assert(sameResults(GraftShims.ofRows(spark, augmented),
      GraftShims.ofRows(spark, p)))
  }
}
