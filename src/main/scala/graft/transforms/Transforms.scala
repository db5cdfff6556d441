package graft.transforms

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  EqualTo, Expression, Literal, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}

/** Query-manipulation operators: LogicalPlan -> LogicalPlan functions, the
  * Spark port of the reference's transform library
  * (/root/reference/postbound/transform.py — flatten_and_predicate :125,
  * as_count_star_query :696, remove_predicate :789, add/drop clause
  * :833/:873, add_ec_predicates :641, ...). Catalyst plans are immutable
  * trees, so each transform returns a new plan.
  */
object Transforms {

  /** Flatten nested ANDs into conjuncts (transform.py:125). */
  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  def andAll(es: Seq[Expression]): Option[Expression] = es.reduceOption(And)

  /** SELECT count(*) over the plan (transform.py:696 — the true-cardinality
    * probe shape). */
  def asCountStar(plan: LogicalPlan): LogicalPlan = {
    val cnt = Alias(AggregateExpression(Count(Literal(1)), Complete,
      isDistinct = false), "count")()
    Aggregate(Nil, Seq(cnt), plan)
  }

  /** SELECT * (identity projection; transform.py:672). */
  def asStar(plan: LogicalPlan): LogicalPlan =
    Project(plan.output.map(_.asInstanceOf[NamedExpression]), plan)

  /** Remove ORDER BY at the root (transform.py drop_clause analog). */
  def dropOrderBy(plan: LogicalPlan): LogicalPlan = plan match {
    case Sort(_, _, child, _) => dropOrderBy(child)
    case other => other
  }

  /** Remove LIMIT/OFFSET wrappers at the root. */
  def dropLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case GlobalLimit(_, child) => dropLimit(child)
    case LocalLimit(_, child) => dropLimit(child)
    case Offset(_, child) => dropLimit(child)
    case other => other
  }

  /** Add LIMIT n (transform.py add_clause analog). */
  def addLimit(plan: LogicalPlan, n: Int): LogicalPlan = Limit(Literal(n), plan)

  /** Remove one conjunct from every Filter that contains it
    * (transform.py:789 remove_predicate). */
  def removePredicate(plan: LogicalPlan, pred: Expression): LogicalPlan =
    plan.transformUp {
      case Filter(cond, child) =>
        val kept = splitConjuncts(cond).filterNot(_.semanticEquals(pred))
        andAll(kept).map(Filter(_, child)).getOrElse(child)
    }

  /** Replace one conjunct with another (transform.py:1281). */
  def replacePredicate(plan: LogicalPlan, from: Expression,
      to: Expression): LogicalPlan =
    plan.transformUp {
      case Filter(cond, child) =>
        val cs = splitConjuncts(cond).map(c =>
          if (c.semanticEquals(from)) to else c)
        Filter(andAll(cs).get, child)
    }

  /** Substitute an expression everywhere it occurs, by semantic equality
    * (transform.py:1208 replace_expressions). */
  def replaceExpressions(plan: LogicalPlan, from: Expression,
      to: Expression): LogicalPlan =
    plan.transformAllExpressions {
      case e if e.semanticEquals(from) => to
    }

  /** Rename an output column via a projection with aliases
    * (transform.py:1336 rename_columns_in_query). */
  def renameOutput(plan: LogicalPlan, from: String, to: String): LogicalPlan =
    Project(plan.output.map { a =>
      if (a.name == from) Alias(a, to)() else a
    }, plan)

  /** Re-alias a plan as a named relation (transform.py:2343 rename_table). */
  def renameTable(plan: LogicalPlan, name: String): LogicalPlan =
    SubqueryAlias(name, plan)

  /** Expand a predicate into a standalone query: SELECT * over the
    * relations it references, filtered by the predicate
    * (transform.py:500 expand_to_query — used to probe predicate
    * selectivity in isolation). `leaves` are the scans of the referenced
    * tables, attribute-compatible with the predicate. */
  def expandToQuery(pred: Expression, leaves: Seq[LogicalPlan]): LogicalPlan = {
    require(leaves.nonEmpty, "expandToQuery needs at least one relation")
    val joined = leaves.reduceLeft[LogicalPlan](
      (l, r) => Join(l, r, org.apache.spark.sql.catalyst.plans.Inner, None,
        JoinHint.NONE))
    Filter(pred, joined)
  }

  private def leafTables(p: LogicalPlan,
      attrToTable: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String]): Set[String] =
    p.collectLeaves()
      .flatMap(_.output.flatMap(a => attrToTable.get(a.exprId))).toSet

  /** Wrap the minimal join subtree covering exactly `tables` in a subquery
    * alias (transform.py:519 move_into_subquery — the branch marker UES
    * uses to compute a pk-partner sub-join first). `attrToTable` maps scan
    * output ExprIds to table identifiers (attribute provenance survives
    * optimization, so this works on analyzed and optimized plans alike). */
  def moveIntoSubquery(plan: LogicalPlan, tables: Set[String], name: String,
      attrToTable: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String]): LogicalPlan = {
    var done = false
    plan.transformUp {
      case j: Join if !done && leafTables(j, attrToTable) == tables =>
        done = true
        SubqueryAlias(name, j)
    }
  }

  /** Replace the minimal join subtree covering exactly `tables` with a
    * single replacement relation (transform.py:2419 merge_tables — e.g. a
    * pre-joined or materialized view standing in for the joined base
    * tables). The replacement must expose the attributes the surrounding
    * plan consumes (same ExprIds), or the result would not resolve. */
  def mergeTables(plan: LogicalPlan, tables: Set[String],
      replacement: LogicalPlan,
      attrToTable: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String]): LogicalPlan = {
    var done = false
    plan.transformUp {
      case j: Join if !done && leafTables(j, attrToTable) == tables =>
        require(j.output.map(_.exprId).toSet
          .subsetOf(replacement.output.map(_.exprId).toSet),
          "merge_tables replacement must cover the merged subtree's output")
        done = true
        replacement
    }
  }

  // ---- generic clause surgery (transform.py:833 add_clause, :873
  // drop_clause, :916 replace_clause). The reference represents a query as
  // a clause container and swaps clause objects; the Catalyst analog
  // decomposes the ROOT query block into its clause-bearing nodes
  // (Limit/Offset/Sort/Having-Filter/Project/Aggregate/Where-Filter),
  // performs field surgery, and recomposes a valid plan. Unlike the
  // reference (which happily produces invalid SQL — it "does not enforce
  // any semantics", qal/_qal.py:8424), composition here always yields an
  // executable plan: e.g. dropping GROUP BY turns a grouped aggregate into
  // the scalar aggregate over the same aggregate functions. ----

  /** Clause-level view of a root query block. `select` is the Project list
    * when the block has a plain projection; `groupBy` carries (keys,
    * aggregate list) when it is an Aggregate. Exactly one of them is
    * typically present (matching SQL: the SELECT list lives in the
    * Aggregate when there is a GROUP BY). */
  final case class QueryClauses(
      limit: Option[Expression] = None,
      offset: Option[Expression] = None,
      orderBy: Option[Seq[SortOrder]] = None,
      having: Option[Expression] = None,
      select: Option[Seq[NamedExpression]] = None,
      groupBy: Option[(Seq[Expression], Seq[NamedExpression])] = None,
      where: Option[Expression] = None,
      from: LogicalPlan = OneRowRelation())

  /** Peel the root query block of an (analyzed) plan into clauses. */
  def decompose(plan: LogicalPlan): QueryClauses = {
    var c = QueryClauses()
    var p = plan
    var peeling = true
    // outer wrappers: limit / offset / order by, any nesting order
    while (peeling) p match {
      case GlobalLimit(n, child) => c = c.copy(limit = Some(n)); p = child
      case LocalLimit(_, child) => p = child
      case Offset(n, child) => c = c.copy(offset = Some(n)); p = child
      case Sort(order, true, child, _) =>
        c = c.copy(orderBy = Some(order)); p = child
      case _ => peeling = false
    }
    // HAVING: a Filter directly over an Aggregate (optionally through a
    // Project the analyzer adds for non-output having references)
    p match {
      case Filter(cond, agg: Aggregate) =>
        c = c.copy(having = Some(cond)); p = agg
      case Project(list, Filter(cond, agg: Aggregate)) =>
        c = c.copy(select = Some(list), having = Some(cond)); p = agg
      case _ =>
    }
    p match {
      case Aggregate(keys, aggs, child, _) =>
        c = c.copy(groupBy = Some((keys, aggs))); p = child
      case Project(list, child) if c.select.isEmpty =>
        c = c.copy(select = Some(list)); p = child
      case _ =>
    }
    p match {
      case Filter(cond, child) => c = c.copy(where = Some(cond)); p = child
      case _ =>
    }
    c.copy(from = p)
  }

  /** Recompose clauses into a plan (inverse of [[decompose]]). */
  def compose(c: QueryClauses): LogicalPlan = {
    var p = c.from
    c.where.foreach(w => p = Filter(w, p))
    c.groupBy.foreach { case (keys, aggs) => p = Aggregate(keys, aggs, p) }
    if (c.groupBy.isEmpty) c.select.foreach(s => p = Project(s, p))
    c.having.foreach(h => p = Filter(h, p))
    if (c.groupBy.nonEmpty) c.select.foreach(s => p = Project(s, p))
    c.orderBy.foreach(o => p = Sort(o, global = true, p))
    c.offset.foreach(n => p = Offset(n, p))
    c.limit.foreach(n => p = Limit(n, p))
    p
  }

  /** Replace the SELECT list of the root block (replace_clause with a
    * Select clause, transform.py:916). On an Aggregate block the aggregate
    * list IS the select list. */
  def replaceSelectList(plan: LogicalPlan,
      exprs: Seq[NamedExpression]): LogicalPlan = {
    val c = decompose(plan)
    compose(c.groupBy match {
      case Some((keys, _)) if c.select.isEmpty =>
        c.copy(groupBy = Some((keys, exprs)))
      case _ => c.copy(select = Some(exprs))
    })
  }

  /** Add a GROUP BY to a block that has none (add_clause,
    * transform.py:833): the given keys + aggregates become the block's
    * Aggregate; a pre-existing plain select list is discarded (the SQL
    * SELECT list moves into the grouped aggregate, as in the reference's
    * clause replacement). */
  def addGroupBy(plan: LogicalPlan, keys: Seq[Expression],
      aggs: Seq[NamedExpression]): LogicalPlan = {
    val c = decompose(plan)
    require(c.groupBy.isEmpty, "block already has a GROUP BY — use replaceGroupBy")
    compose(c.copy(groupBy = Some((keys, aggs)), select = None))
  }

  /** Replace the GROUP BY keys of an aggregate block, keeping aggregate
    * functions: grouping-key columns in the aggregate list are swapped for
    * the new keys. */
  def replaceGroupBy(plan: LogicalPlan, keys: Seq[Expression],
      aggs: Seq[NamedExpression]): LogicalPlan = {
    val c = decompose(plan)
    require(c.groupBy.nonEmpty, "block has no GROUP BY — use addGroupBy")
    compose(c.copy(groupBy = Some((keys, aggs))))
  }

  /** Drop the GROUP BY (drop_clause, transform.py:873): the block becomes
    * the SCALAR aggregate of its aggregate functions — grouping-key
    * columns leave the select list (they are meaningless without groups),
    * which keeps the result a valid plan, unlike the reference's unchecked
    * clause removal. HAVING/ORDER BY referring to dropped keys are
    * dropped with it. */
  def dropGroupBy(plan: LogicalPlan): LogicalPlan = {
    val c = decompose(plan)
    require(c.groupBy.nonEmpty, "block has no GROUP BY")
    val (keys, aggs) = c.groupBy.get
    val keyIds = keys.collect { case a: Attribute => a.exprId }.toSet
    val scalarAggs = aggs.filter {
      case a: Attribute => !keyIds.contains(a.exprId)
      case al: Alias => al.child.find {
        case ae: AggregateExpression => true; case _ => false
      }.isDefined
      case _ => true
    }
    require(scalarAggs.nonEmpty, "dropping GROUP BY would leave no output")
    compose(c.copy(groupBy = Some((Nil, scalarAggs)), having = None,
      orderBy = None, select = None))
  }

  /** Add a WHERE conjunct (add_clause on the Where clause). */
  def addWhere(plan: LogicalPlan, cond: Expression): LogicalPlan = {
    val c = decompose(plan)
    compose(c.copy(where = Some(c.where.map(And(_, cond)).getOrElse(cond))))
  }

  /** Drop the WHERE clause entirely (drop_clause). */
  def dropWhere(plan: LogicalPlan): LogicalPlan =
    compose(decompose(plan).copy(where = None))

  /** Strip all optimizer hints: ResolvedHint wrappers and per-join
    * JoinHint annotations (transform.py:720 drop_hints — there it strips
    * pg_hint_plan comment blocks; here the Catalyst carriers). */
  def dropHints(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case ResolvedHint(child, _) => child
    case h: UnresolvedHint => h.child
    case j: Join if j.hint != JoinHint.NONE => j.copy(hint = JoinHint.NONE)
  }

  /** Transitive closure of attribute equalities: `a=b AND b=c` implies
    * `a=c`. Returns the closure's new conjuncts, deterministic order. */
  def equalityClosure(conjuncts: Seq[Expression]): Seq[Expression] = {
    val eqs = conjuncts.collect { case EqualTo(a: Attribute, b: Attribute) => (a, b) }
    val parent = scala.collection.mutable.Map.empty[Attribute, Attribute]
    def find(a: Attribute): Attribute = {
      val p = parent.getOrElseUpdate(a, a)
      if (p.semanticEquals(a)) a else { val r = find(p); parent(a) = r; r }
    }
    eqs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (!ra.semanticEquals(rb)) parent(ra) = rb
    }
    val existing = eqs.flatMap { case (a, b) =>
      Seq(Set(a.exprId, b.exprId))
    }.toSet
    val classes = parent.keys.toSeq.groupBy(find).values
      .map(_.sortBy(_.exprId.id)).filter(_.size > 2).toSeq
    for {
      cls <- classes
      Seq(a, b) <- cls.combinations(2).toSeq
      if !existing.contains(Set(a.exprId, b.exprId))
    } yield EqualTo(a, b)
  }
}

/** Custom Catalyst rule: augment Filter conditions with the transitive
  * closure of equi-join predicates. Catalyst infers *filters* from
  * constraints but does not add redundant join edges — the augmentation
  * gives the join-order search more edges to work with (SURVEY §4,
  * reference: add_ec_predicates transform.py:641 +
  * generate_predicates_for_equivalence_classes qal/_qal.py:3599).
  * Inject via `spark.experimental.extraOptimizations` or
  * SparkSessionExtensions.injectOptimizerRule.
  */
object AugmentEquiJoinPredicates extends Rule[LogicalPlan] {
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = Transforms.splitConjuncts(cond)
      val extra = Transforms.equalityClosure(conjuncts)
      if (extra.isEmpty) f
      else Filter(Transforms.andAll(conjuncts ++ extra).get, child)
  }
}
