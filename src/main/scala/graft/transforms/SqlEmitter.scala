package graft.transforms

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._

/** SQL-text emission for (possibly transformed) logical plans — the
  * Spark-side analog of the reference's `format_quick` (/root/reference/
  * postbound/qal/_formatter.py, used throughout transform.py and the
  * hinting backends): every QAL tree there can be rendered back to SQL;
  * here the transform library rewrites `LogicalPlan`s, and this emitter
  * closes the loop so a rewritten plan can be diffed, logged, persisted,
  * or re-executed AS TEXT by Spark or any ANSI engine.
  *
  * Coverage is the clause surface the QAL facade and transform library
  * produce: SELECT/DISTINCT, FROM with inner/outer/cross join trees and
  * aliased or derived relations, WHERE, GROUP BY (+HAVING), ORDER BY,
  * LIMIT/OFFSET, window functions (folded back into the SELECT list with
  * their analyzed frames), UNION/INTERSECT/EXCEPT (ALL and DISTINCT),
  * CTE containers (`WithCTE`/`CTERelationRef` render as a WITH clause),
  * semi/anti join structures (rendered back as correlated EXISTS /
  * NOT EXISTS predicates, the reference's `UnaryPredicate` surface), and
  * join-strategy hints (`ResolvedHint` carriers render as the standard
  * hint comment on their enclosing block — hinted SQL text is the
  * reference's hinting-backend output format), and correlated LATERAL
  * subqueries (outer references re-qualify against the enclosing block).
  * Anything else — generators chiefly — throws
  * `UnsupportedOperationException` naming the node, mirroring the
  * reference's contract that formatting is defined for QAL trees only
  * (not arbitrary engine plans). Expressions render through Catalyst's
  * own `Expression.sql` with attributes re-qualified by their source
  * alias, so self-joined relations stay unambiguous.
  */
object SqlEmitter {

  def toSql(plan: LogicalPlan): String = new SqlEmitter().emitQuery(plan)
}

private final class SqlEmitter {

  /** Synthetic derived-table aliases, deterministic per emission. */
  private var subqueryCount = 0
  private def nextSubAlias(): String = {
    subqueryCount += 1
    s"__sub$subqueryCount"
  }

  private def unsupported(p: LogicalPlan, why: String = ""): Nothing =
    throw new UnsupportedOperationException(
      s"SQL emission does not cover ${p.nodeName} nodes" +
        (if (why.isEmpty) "" else s" ($why)") +
        s": ${p.simpleString(maxFields = 8).take(200)}")

  /** CTE def id -> emitted WITH name, for reference sites that are NOT
    * wrapped in a SubqueryAlias carrying the name (a transform may have
    * rebuilt the def without one — the name is then synthetic). */
  private var cteNames: Map[Long, String] = Map.empty

  def emitQuery(plan: LogicalPlan): String = plan match {
    // WITH clause: the analyzer hoists every named CTE into a WithCTE
    // container whose defs are SubqueryAlias(name, plan); reference
    // sites become CTERelationRef leaves that emitRelation renders by
    // that name. Defs may reference earlier defs — definition order is
    // preserved, so the emitted WITH list stays valid. A def a transform
    // rebuilt WITHOUT its SubqueryAlias still emits — under a synthetic
    // name that its reference sites resolve through [[cteNames]].
    case w: WithCTE =>
      val defs = w.cteDefs.map { d =>
        val (name, body) = d.child match {
          case SubqueryAlias(id, b) => (id.name, b)
          case other => (s"__cte${d.id}", other)
        }
        cteNames += d.id -> name
        s"${quoted(name)} AS (${emitQuery(body)})"
      }
      s"WITH ${defs.mkString(", ")} ${emitQuery(w.plan)}"
    case GlobalLimit(l, LocalLimit(_, child)) =>
      s"${emitQuery(child)} LIMIT ${l.sql}"
    case Offset(o, child) =>
      s"${emitQuery(child)} OFFSET ${o.sql}"
    case Sort(order, true, child, _) =>
      val aliases = aliasMap(child)
      val by = order.map(o => renderExpr(o, aliases)).mkString(", ")
      s"${emitQuery(child)} ORDER BY $by"
    case Distinct(u: Union) =>
      unionChildren(u).map(c => s"(${emitQuery(c)})").mkString(" UNION ")
    case Distinct(child) => emitSelect(child, distinct = true)
    case u: Union =>
      unionChildren(u).map(c => s"(${emitQuery(c)})").mkString(" UNION ALL ")
    case Intersect(l, r, isAll) =>
      s"(${emitQuery(l)}) INTERSECT${if (isAll) " ALL" else ""} (${emitQuery(r)})"
    case Except(l, r, isAll) =>
      s"(${emitQuery(l)}) EXCEPT${if (isAll) " ALL" else ""} (${emitQuery(r)})"
    case other => emitSelect(other, distinct = false)
  }

  /** Join-strategy hints collected from ResolvedHint carriers while the
    * enclosing block's FROM tree renders; each SELECT block opens its own
    * scope and prepends its hints as the standard hint comment — the
    * reference's formatter emits hint blocks the same way (its hinting
    * backends' whole output IS hinted SQL text).
    */
  private val hintScopes =
    scala.collection.mutable.Stack.empty[scala.collection.mutable.ListBuffer[String]]

  /** UNION children, positional. A by-name union (the DataFrame
    * `unionByName` shape) emits as positional SQL by reordering every
    * non-first child's projection to the first child's column-name
    * order — name resolution happens HERE so the emitted text means the
    * same thing in any ANSI engine. Ragged schemas with
    * `allowMissingColumns` follow Spark's own semantics: the target
    * column list is the first child's columns plus every later child's
    * extra columns in order of first appearance, and EVERY child projects
    * to that list with typed NULLs where a column is missing. Ragged
    * without the flag is an analysis error upstream and stays
    * unsupported here.
    */
  private def unionChildren(u: Union): Seq[LogicalPlan] = {
    if (!u.byName) return u.children
    val target = scala.collection.mutable.LinkedHashMap
      .empty[String, Attribute]
    u.children.foreach(_.output.foreach(a =>
      if (!target.contains(a.name)) target += a.name -> a))
    val ragged = u.children.exists(_.output.size != target.size)
    if (ragged && !u.allowMissingCol)
      unsupported(u, "ragged by-name union without allowMissingColumns")
    u.children.map { c =>
      val byName = c.output.map(a => a.name -> a).toMap
      Project(target.toSeq.map { case (n, lead) =>
        byName.getOrElse(n,
          Alias(Cast(Literal(null), lead.dataType), n)())
      }, c)
    }
  }

  /** The SELECT...FROM...WHERE...[GROUP BY...HAVING] block. */
  private def emitSelect(plan: LogicalPlan, distinct: Boolean): String = {
    hintScopes.push(scala.collection.mutable.ListBuffer.empty)
    val body = emitSelectBody(plan, distinct)
    val hints = hintScopes.pop()
    if (hints.isEmpty) body
    else s"SELECT /*+ ${hints.mkString(", ")} */ " +
      body.stripPrefix("SELECT ")
  }

  private def emitSelectBody(plan: LogicalPlan, distinct: Boolean): String = {
    val d = if (distinct) "DISTINCT " else ""
    plan match {
      // window functions: the analyzer stacks
      // Project(outer) -> [forwarding Project ->] Window -> Project(inputs);
      // fold the Window back into the SELECT list by inlining each window
      // output's defining expression (Expression.sql renders the full
      // OVER (...) clause including the analyzed frame)
      // single-column generator in the SELECT list (`SELECT explode(x)
      // AS v FROM t`): inline the generator expression back into the
      // projection. Multi-output generators (posexplode), outer and
      // qualified forms stay unsupported — their inlining would not be
      // expressible as a plain SELECT item.
      case Project(exprs, g: Generate)
          if g.generatorOutput.size == 1 && !g.outer && g.qualifier.isEmpty =>
        val genAttr = g.generatorOutput.head
        val aliases = aliasMap(g.child)
        val items = exprs.map { e =>
          val inlined = e match {
            case ar: AttributeReference if ar.exprId == genAttr.exprId =>
              Alias(g.generator, ar.name)()
            case other => other.transform {
              case ar: AttributeReference if ar.exprId == genAttr.exprId =>
                g.generator
            }.asInstanceOf[NamedExpression]
          }
          renderExpr(inlined, aliases)
        }.mkString(", ")
        s"SELECT $d$items FROM ${emitFromWhere(g.child, aliases)}"
      case Project(exprs, WindowBelow(w)) =>
        val from = stripForwardingProject(w.child)
        val aliases = aliasMap(from)
        val items = inlineWindows(exprs, w)
          .map(e => renderExpr(e, aliases)).mkString(", ")
        s"SELECT $d$items FROM ${emitFromWhere(from, aliases)}"
      case Project(exprs, child) =>
        val aliases = aliasMap(child)
        val items = exprs.map(e => renderExpr(e, aliases)).mkString(", ")
        s"SELECT $d$items FROM ${emitFromWhere(child, aliases)}"
      case Filter(having, agg: Aggregate) =>
        emitAggregate(agg, Some(having), d)
      case agg: Aggregate =>
        emitAggregate(agg, None, d)
      // bare join/filter root (e.g. after a projection-dropping transform)
      case other =>
        val aliases = aliasMap(other)
        s"SELECT $d* FROM ${emitFromWhere(other, aliases)}"
    }
  }

  private def emitAggregate(agg: Aggregate, having: Option[Expression],
      distinct: String): String = {
    val aliases = aliasMap(agg.child)
    val items = agg.aggregateExpressions
      .map(e => renderExpr(e, aliases)).mkString(", ")
    val group =
      if (agg.groupingExpressions.isEmpty) ""
      else " GROUP BY " + agg.groupingExpressions
        .map(e => renderExpr(e, aliases)).mkString(", ")
    val hav = having.map(h => s" HAVING ${renderExpr(h, aliases)}").getOrElse("")
    s"SELECT $distinct$items FROM ${emitFromWhere(agg.child, aliases)}$group$hav"
  }

  /** FROM clause body (+ WHERE when filters exist): renders the join tree
    * under a query block. Filters directly above the join tree become the
    * WHERE conjunction; filters on individual leaves stay inside derived
    * subqueries only when the leaf itself is one.
    */
  private def emitFromWhere(plan: LogicalPlan,
      aliases: Map[ExprId, Seq[String]]): String = {
    val (filtered, wheres) = splitFilters(plan)
    val (fromPlan, existsPreds) = stripSemiAnti(filtered, aliases)
    val from = emitRelation(fromPlan, aliases)
    val preds = wheres.map(w => renderPredicate(w, aliases)) ++ existsPreds
    if (preds.isEmpty) from
    else s"$from WHERE ${preds.mkString(" AND ")}"
  }

  /** A WHERE conjunct. Subquery expressions need their own rendering:
    * an ANALYZED (pre-optimizer) `EXISTS`/`IN (SELECT ...)` is still an
    * [[Exists]]/[[InSubquery]] expression whose `Expression.sql` prints
    * the non-SQL `exists(outerAttrs...)` form — emitting that silently
    * produces broken text. The subquery plan emits as a full block with
    * the enclosing aliases as its outer scope (correlation predicates
    * live INSIDE the plan as OuterReference filters), so hints inside the
    * subquery land on the subquery's own block.
    */
  private def renderPredicate(e: Expression,
      aliases: Map[ExprId, Seq[String]]): String = e match {
    case ex: Exists => subquerySql(ex.plan, aliases, "EXISTS")
    case Not(ex: Exists) => "NOT " + subquerySql(ex.plan, aliases, "EXISTS")
    case InSubquery(values, lq: ListQuery) =>
      val v = values.map(renderExpr(_, aliases)).mkString(", ")
      val lhs = if (values.size == 1) v else s"($v)"
      s"$lhs IN ${subquerySql(lq.plan, aliases, "")}"
    case Not(InSubquery(values, lq: ListQuery)) =>
      val v = values.map(renderExpr(_, aliases)).mkString(", ")
      val lhs = if (values.size == 1) v else s"($v)"
      s"$lhs NOT IN ${subquerySql(lq.plan, aliases, "")}"
    case other => renderExpr(other, aliases)
  }

  private def subquerySql(plan: LogicalPlan,
      aliases: Map[ExprId, Seq[String]], keyword: String): String = {
    val saved = outerScope
    outerScope = outerScope ++ aliases
    val sub = try emitQuery(plan) finally { outerScope = saved }
    s"$keyword ($sub)"
  }

  /** Hoists semi/anti joins out of the join tree into correlated
    * EXISTS / NOT EXISTS predicates — the inverse of the analyzer's
    * subquery rewrite and the rendering the reference's formatter uses
    * for its semi-join structures. Hoisting is semantics-preserving from
    * under inner joins (the predicate conjoins with the WHERE clause);
    * semi joins nested under outer joins are left in place and fail in
    * `joinKeyword`, naming the node.
    */
  private def stripSemiAnti(plan: LogicalPlan,
      aliases: Map[ExprId, Seq[String]]): (LogicalPlan, Seq[String]) =
    plan match {
      case Join(l, r, LeftSemi, cond, _) =>
        val (lp, lpreds) = stripSemiAnti(l, aliases)
        (lp, lpreds :+ existsPredicate(r, cond, aliases, negated = false))
      case Join(l, r, LeftAnti, cond, _) =>
        val (lp, lpreds) = stripSemiAnti(l, aliases)
        (lp, lpreds :+ existsPredicate(r, cond, aliases, negated = true))
      case j @ Join(l, r, Inner, _, _) =>
        val (lp, lpreds) = stripSemiAnti(l, aliases)
        val (rp, rpreds) = stripSemiAnti(r, aliases)
        (j.copy(left = lp, right = rp), lpreds ++ rpreds)
      case other => (other, Seq.empty)
    }

  /** One [NOT] EXISTS (SELECT 1 FROM right WHERE ...) predicate: the
    * right side's own filters and the join condition conjoin inside the
    * subquery; attributes of BOTH sides qualify through the shared alias
    * map, so the outer correlation renders naturally.
    */
  private def existsPredicate(right: LogicalPlan, cond: Option[Expression],
      aliases: Map[ExprId, Seq[String]], negated: Boolean): String = {
    val (rp, rFilters) = splitFilters(right)
    // the subquery opens its OWN hint scope: a ResolvedHint inside the
    // EXISTS right side names an alias visible only in the subquery
    // block, so registering it on the enclosing SELECT would emit a
    // comment Spark drops with a warning (silent hint loss)
    hintScopes.push(scala.collection.mutable.ListBuffer.empty)
    val inner =
      try emitRelation(rp, aliases)
      finally ()
    val hints = hintScopes.pop()
    val hintTxt =
      if (hints.isEmpty) "" else s"/*+ ${hints.mkString(", ")} */ "
    val preds = (rFilters ++ cond.toSeq.flatMap(splitConjuncts))
      .map(e => renderExpr(e, aliases))
    val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
    val not = if (negated) "NOT " else ""
    s"${not}EXISTS (SELECT ${hintTxt}1 FROM $inner$where)"
  }

  private def splitFilters(plan: LogicalPlan): (LogicalPlan, Seq[Expression]) =
    plan match {
      case Filter(c, child) =>
        val (p, rest) = splitFilters(child)
        (p, splitConjuncts(c) ++ rest)
      case other => (other, Seq.empty)
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def joinKeyword(t: JoinType): String = t match {
    case Inner => "JOIN"
    case LeftOuter => "LEFT JOIN"
    case RightOuter => "RIGHT JOIN"
    case FullOuter => "FULL JOIN"
    case Cross => "CROSS JOIN"
    case other => throw new UnsupportedOperationException(
      s"SQL emission does not cover $other joins")
  }

  /** Alias context of enclosing blocks, consulted when a lateral
    * subquery's OuterReference needs qualification by an OUTER relation's
    * alias (the inner block's own alias map cannot know it). */
  private var outerScope: Map[ExprId, Seq[String]] = Map.empty

  private def emitRelation(plan: LogicalPlan,
      aliases: Map[ExprId, Seq[String]]): String = plan match {
    // correlated lateral subquery in relation position: `left, LATERAL
    // (sub) AS alias` (comma form for the plain inner shape, JOIN LATERAL
    // with ON otherwise); the outer block's aliases become the subquery's
    // outer scope so correlation predicates render qualified
    case lj: LateralJoin =>
      val left = emitRelation(lj.left, aliases)
      val (kw, on) = (lj.joinType, lj.condition) match {
        case (Inner, None) => (",", "")
        case (Inner, Some(c)) => (" JOIN", s" ON ${renderExpr(c, aliases)}")
        case (LeftOuter, c) => (" LEFT JOIN",
          s" ON ${c.map(renderExpr(_, aliases)).getOrElse("true")}")
        case _ => unsupported(lj)
      }
      val (alias, sub) = lj.right.plan match {
        case SubqueryAlias(id, child) => (id.name, child)
        case p => (nextSubAlias(), p)
      }
      val saved = outerScope
      outerScope = outerScope ++ aliases
      val subSql = try emitQuery(sub) finally outerScope = saved
      s"$left$kw LATERAL ($subSql) AS ${quoted(alias)}$on"
    // join-strategy hint carrier: record the hint against the relation's
    // alias in the enclosing SELECT block's scope, emit the child as-is
    case ResolvedHint(child, info) =>
      info.strategy.foreach { st =>
        val name = st match {
          case BROADCAST => "BROADCAST"
          case SHUFFLE_MERGE => "MERGE"
          case SHUFFLE_HASH => "SHUFFLE_HASH"
          case SHUFFLE_REPLICATE_NL => "SHUFFLE_REPLICATE_NL"
          case other => other.toString
        }
        val alias = child match {
          case SubqueryAlias(id, _) => Some(id.name)
          case _ => None
        }
        (alias, hintScopes.headOption) match {
          case (Some(a), Some(scope)) => scope += s"$name(${quoted(a)})"
          case _ => // un-aliased or scope-less hint: drop, never mis-emit
        }
      }
      emitRelation(child, aliases)
    case Join(l, r, t, cond, _) =>
      val left = emitRelation(l, aliases)
      val right = emitRelation(r, aliases)
      val on = cond.map(c => s" ON ${renderExpr(c, aliases)}").getOrElse(
        t match {
          case Inner | Cross => ""
          case other => throw new UnsupportedOperationException(
            s"$other join without condition")
        })
      val kw = cond match {
        case None if t == Inner => "CROSS JOIN" // ANSI spelling of bare product
        case _ => joinKeyword(t)
      }
      s"$left $kw $right$on"
    // CTE reference under its name-carrying alias: the emitted WITH name
    // may be synthetic (alias-stripped def), so resolve through the
    // registry and re-alias when they differ
    case SubqueryAlias(id, r: CTERelationRef) =>
      val base = cteNames.getOrElse(r.cteId, id.name)
      if (base == id.name) quoted(id.name)
      else s"${quoted(base)} AS ${quoted(id.name)}"
    // table AS alias (double wrap) or plain table
    case SubqueryAlias(outer, SubqueryAlias(inner, _)) =>
      if (outer.name == inner.name) quoted(inner.name)
      else s"${quoted(inner.name)} AS ${quoted(outer.name)}"
    case SubqueryAlias(id, child) if isLeafRelation(child) => quoted(id.name)
    // derived table: a full subquery under an alias
    case SubqueryAlias(id, child) =>
      s"(${emitQuery(child)}) AS ${quoted(id.name)}"
    // a CTE reference a transform left bare (no SubqueryAlias): resolve
    // the name through the enclosing WITH clause's def registry
    case r: CTERelationRef =>
      quoted(cteNames.getOrElse(r.cteId,
        unsupported(r, "reference outside any emitted WITH clause")))
    // a bare query block in relation position (e.g. an aggregate built
    // over a projected block by asCountStar, or a set operation /
    // sort / offset / filtered block a transform spliced in): a derived
    // table with a synthetic, deterministic alias. Only shapes emitQuery
    // handles at top level belong here — anything else would recurse
    // back to this case.
    case p @ (_: Project | _: Aggregate | _: Distinct | _: GlobalLimit |
        _: Union | _: Intersect | _: Except | _: Sort | _: Offset |
        _: WithCTE) =>
      s"(${emitQuery(p)}) AS ${quoted(nextSubAlias())}"
    // a filtered join leg CANNOT become a synthetic derived table: the
    // alias map already qualified the leg's attributes by the inner
    // relation's alias, which the derived table would hide — the emitted
    // SQL would fail resolution. Name the fix instead of mis-emitting.
    case f: Filter =>
      unsupported(f, "filtered relation inside a join tree; hoist the " +
        "filter into the block's WHERE or alias the leg as a derived table")
    case g: Generate =>
      unsupported(g, "generator in relation position; only the " +
        "single-column SELECT-list form `SELECT explode(x) AS v` emits")
    case other => unsupported(other, "relation position")
  }

  /** Matches a Window directly below, or behind the attribute-only
    * forwarding Project the analyzer inserts above Window nodes.
    */
  private object WindowBelow {
    def unapply(p: LogicalPlan): Option[Window] = p match {
      case w: Window => Some(w)
      case Project(es, w: Window)
          if es.forall(_.isInstanceOf[AttributeReference]) => Some(w)
      case _ => None
    }
  }

  /** Drops an attribute-only projection (the analyzer's input-forwarding
    * shim under Window) so the real FROM tree emits directly.
    */
  private def stripForwardingProject(p: LogicalPlan): LogicalPlan = p match {
    case Project(es, child)
        if es.forall(_.isInstanceOf[AttributeReference])
          && es.map(_.exprId).toSet == child.outputSet.map(_.exprId) =>
      child
    case other => other
  }

  /** Replace references to Window outputs with their defining window
    * expressions, preserving output names.
    */
  private def inlineWindows(exprs: Seq[NamedExpression],
      w: Window): Seq[NamedExpression] = {
    val winMap: Map[ExprId, Expression] = w.windowExpressions.collect {
      case a: Alias => a.exprId -> a.child
    }.toMap
    exprs.map {
      case ar: AttributeReference if winMap.contains(ar.exprId) =>
        Alias(winMap(ar.exprId), ar.name)()
      case e => e.transform {
        case ar: AttributeReference if winMap.contains(ar.exprId) =>
          winMap(ar.exprId)
      }.asInstanceOf[NamedExpression]
    }
  }

  private def isLeafRelation(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    // temp views analyze to SubqueryAlias(name, View(_, _, plan)) — the
    // view is addressable by name, so it IS a base relation for emission
    case v: View => true
    case SubqueryAlias(_, child) => isLeafRelation(child)
    case _ => false
  }

  private def quoted(name: String): String =
    org.apache.spark.sql.catalyst.util.quoteIfNeeded(name)

  /** Alias qualification for every attribute reachable from the FROM
    * tree: exprId -> Seq(alias, column). Attributes outside the map
    * (e.g. aggregate outputs referenced by ORDER BY) render unqualified.
    */
  private def aliasMap(plan: LogicalPlan): Map[ExprId, Seq[String]] = {
    val m = Map.newBuilder[ExprId, Seq[String]]
    def leafAlias(p: LogicalPlan): Option[String] = p match {
      case SubqueryAlias(outer, _) => Some(outer.name)
      case _ => None
    }
    def walk(p: LogicalPlan): Unit = p match {
      case Join(l, r, _, _, _) => walk(l); walk(r)
      case lj: LateralJoin => walk(lj.left); walk(lj.right.plan)
      case Filter(_, child) => walk(child)
      case ResolvedHint(child, _) => walk(child)
      case s @ SubqueryAlias(id, _) =>
        s.output.foreach(a => m += a.exprId -> Seq(id.name, a.name))
      case other =>
        leafAlias(other).foreach { al =>
          other.output.foreach(a => m += a.exprId -> Seq(al, a.name))
        }
    }
    walk(plan)
    m.result()
  }

  /** Render an expression as SQL, with source attributes re-qualified by
    * their relation alias (Catalyst's own `.sql` leaves resolved
    * attributes bare, which breaks self-joins).
    */
  private def renderExpr(e: Expression,
      aliases: Map[ExprId, Seq[String]]): String = {
    val requalified = e.transform {
      // correlation marker: resolve against the ENCLOSING block's aliases
      // (Catalyst's own .sql would print the non-SQL `outer(...)` form)
      case OuterReference(a: AttributeReference) =>
        outerScope.get(a.exprId)
          .map(parts => UnresolvedAttribute(parts): Expression)
          .getOrElse(UnresolvedAttribute(Seq(a.name)))
      case a: AttributeReference =>
        aliases.get(a.exprId)
          .map(parts => UnresolvedAttribute(parts): Expression)
          .getOrElse(UnresolvedAttribute(Seq(a.name)))
    }
    requalified.sql
  }
}
