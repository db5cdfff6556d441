package graft.qal

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, ExprId, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan,
  SubqueryAlias}
import graft.core.{ColumnRef, TableRef}

/** One predicate conjunct, classified by the tables it references —
  * the Spark analog of the reference's join/filter predicate split
  * (is_join == references >= 2 tables, /root/reference/postbound/qal/
  * _qal.py:2078-2460 and QueryPredicates :4304-4957).
  */
final case class Conjunct(expr: Expression, tables: Set[String]) {
  def isFilter: Boolean = tables.size <= 1
  def isJoin: Boolean = tables.size >= 2
  /** Equi-join columns when the conjunct is `a.x = b.y`. */
  def equiColumns(attrToTable: Map[ExprId, TableRef]): Option[(ColumnRef, ColumnRef)] =
    expr match {
      case EqualTo(a: Attribute, b: Attribute) =>
        for {
          ta <- attrToTable.get(a.exprId); tb <- attrToTable.get(b.exprId)
        } yield (ColumnRef(a.name, Some(ta)), ColumnRef(b.name, Some(tb)))
      case _ => None
    }
}

/** The decomposed inner-join block of a query: scan leaves (original
  * analyzed subtrees, exprIds preserved so the surrounding plan still
  * resolves after reconstruction), plus all conjuncts of the block.
  */
final case class JoinBlock(
    root: LogicalPlan,
    leaves: Seq[(TableRef, LogicalPlan)],
    attrToTable: Map[ExprId, TableRef],
    conjuncts: Seq[Conjunct]) {
  def tables: Seq[TableRef] = leaves.map(_._1)
  def leafPlan(identifier: String): LogicalPlan =
    leaves.find(_._1.identifier == identifier).get._2
  def filtersFor(identifier: String): Seq[Expression] =
    conjuncts.filter(c => c.isFilter && c.tables == Set(identifier)).map(_.expr)
  /** Filters with no table reference at all (constant predicates). */
  def constantFilters: Seq[Expression] =
    conjuncts.filter(c => c.tables.isEmpty).map(_.expr)
  def joinConjuncts: Seq[Conjunct] = conjuncts.filter(_.isJoin)
}

/** QAL façade: wraps a SQL query's analyzed Catalyst plan and exposes the
  * reference's query-introspection surface (tables / filters / joins /
  * join graph) by walking `Filter`/`Join` conditions and splitting
  * conjuncts on attribute provenance. Catalyst *is* the relational
  * algebra layer (SURVEY §2.1), so nothing is re-modelled — this class
  * only decomposes and re-composes plans.
  */
final class QueryFacade(val spark: SparkSession, val sql: String)
    extends PredicateHelper {

  lazy val df: DataFrame = spark.sql(sql)
  lazy val analyzed: LogicalPlan = df.queryExecution.analyzed

  /** The topmost contiguous inner-join block, if the query has one. */
  lazy val joinBlock: Option[JoinBlock] = {
    val rootOpt = analyzed.collectFirst {
      case f @ Filter(_, child) if child.isInstanceOf[Join] => f
      case j: Join => j
    }
    rootOpt.flatMap { root =>
      var leaves = Vector.empty[(TableRef, LogicalPlan)]
      var conjuncts = Vector.empty[Expression]
      var supported = true

      def tableRefOf(p: LogicalPlan): TableRef = p match {
        case SubqueryAlias(outer, SubqueryAlias(inner, _)) =>
          TableRef(inner.name, Some(outer.name))
        case SubqueryAlias(id, _) => TableRef(id.name)
        case other => TableRef(s"__derived_${leaves.size}", virtual = true)
      }

      def walk(p: LogicalPlan): Unit = p match {
        case Join(l, r, Inner, cond, _) =>
          walk(l); walk(r)
          cond.foreach(c => conjuncts ++= splitConjunctivePredicates(c))
        case Join(_, _, _, _, _) => supported = false // outer joins: keep native
        case Filter(c, child) =>
          conjuncts ++= splitConjunctivePredicates(c); walk(child)
        case leaf => leaves :+= (tableRefOf(leaf), leaf)
      }
      walk(root)

      val names = leaves.map(_._1.identifier)
      if (!supported || leaves.size < 2 || names.distinct.size != names.size) None
      else {
        val attrToTable: Map[ExprId, TableRef] = leaves.flatMap { case (t, p) =>
          p.output.map(a => a.exprId -> t)
        }.toMap
        val classified = conjuncts.map { e =>
          Conjunct(e, e.references.toSeq
            .flatMap(a => attrToTable.get(a.exprId)).map(_.identifier).toSet)
        }
        Some(JoinBlock(root, leaves, attrToTable, classified))
      }
    }
  }

  def tables: Seq[TableRef] = joinBlock.map(_.tables).getOrElse {
    analyzed.collect { case SubqueryAlias(id, _) => TableRef(id.name) }.distinct
  }

  def filterPredicates: Seq[Conjunct] =
    joinBlock.map(_.conjuncts.filter(_.isFilter)).getOrElse(Nil)

  def joinPredicates: Seq[Conjunct] =
    joinBlock.map(_.joinConjuncts).getOrElse(Nil)

  /** Replace the join block with a reconstructed plan and return the result
    * as a DataFrame (the enforcement step: SURVEY §3.2 step 6).
    */
  def withEnforcedBlock(replacement: LogicalPlan): DataFrame = {
    val block = joinBlock.getOrElse(
      throw new IllegalStateException("query has no join block to enforce"))
    val newPlan = analyzed.transformDown {
      case n if n eq block.root => replacement
    }
    GraftShims.ofRows(spark, newPlan)
  }
}

object QueryFacade {
  def apply(spark: SparkSession, sql: String): QueryFacade =
    new QueryFacade(spark, sql)

  def andAll(exprs: Seq[Expression]): Option[Expression] =
    exprs.reduceOption(And)
}
