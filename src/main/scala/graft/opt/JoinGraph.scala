package graft.opt

import org.apache.spark.sql.catalyst.expressions.Expression
import graft.core.{ColumnRef, TableRef}
import graft.qal.{Conjunct, JoinBlock}
import graft.stats.EmulatedStatistics

/** An edge of the join graph: a join conjunct connecting exactly two
  * tables, with its equi-columns when it is `a.x = b.y`.
  */
final case class JoinEdge(tables: Set[String], expr: Expression,
    equiColumns: Option[(ColumnRef, ColumnRef)]) {
  def connects(a: String, b: String): Boolean = tables == Set(a, b)
  def touches(ts: Set[String]): Boolean = tables.exists(ts.contains)
  /** The column on `table`'s side, if this is an equi edge. */
  def columnOf(table: String): Option[ColumnRef] = equiColumns.flatMap {
    case (ca, cb) =>
      if (ca.table.exists(_.identifier == table)) Some(ca)
      else if (cb.table.exists(_.identifier == table)) Some(cb)
      else None
  }
}

/** Join graph over a query's join block: tables are nodes, two-table join
  * conjuncts are edges; multi-table conjuncts are kept as post-join
  * predicates. pk/fk classification uses the ndv == rowcount heuristic
  * (Spark has no declared key metadata — SURVEY §7.4-3; reference reads
  * real constraints, /root/reference/postbound/opt/_joingraph.py:360-1148).
  */
final class JoinGraph(val block: JoinBlock, val stats: EmulatedStatistics,
    augment: Boolean = false) {

  /** Per-graph attachment slots for derived caches (e.g. the UES bound
    * model and its subset memo): storing them ON the graph ties their
    * lifetime to the graph's without any global map that could retain
    * graphs or collide across instances. */
  private[opt] val attachments =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private val baseEdges: Seq[JoinEdge] = block.joinConjuncts.collect {
    case c @ Conjunct(e, ts) if ts.size == 2 =>
      JoinEdge(ts, e, c.equiColumns(block.attrToTable))
  }

  /** With `augment = true`, edges include the equivalence-class closure
    * (see [[augmentedEdges]]): join-order search sees transitive
    * connectivity directly. */
  val edges: Seq[JoinEdge] =
    if (augment) augmentFrom(baseEdges) else baseEdges

  /** Conjuncts spanning 3+ tables — applied above the join tree. */
  val postJoinPredicates: Seq[Expression] =
    block.joinConjuncts.filter(_.tables.size > 2).map(_.expr)

  def tables: Seq[String] = block.tables.map(_.identifier)

  def edgesBetween(joined: Set[String], candidate: String): Seq[JoinEdge] =
    edges.filter(e => e.tables.contains(candidate) &&
      (e.tables - candidate).subsetOf(joined))

  /** Free tables reachable from the joined set by at least one edge. */
  def neighbors(joined: Set[String]): Seq[String] =
    tables.filterNot(joined.contains)
      .filter(t => edgesBetween(joined, t).nonEmpty)

  def isConnected: Boolean = connectedVia(_ => true)

  /** Connectivity over the EQUI-subgraph only: true when every table is
    * reachable through edges that carry at least one equality column pair.
    * Pure theta edges (e.g. JOB-style `a.line < b.line` between two fact
    * aliases that are also equi-joined through a shared parent) then count
    * as residual predicates, not as the graph's connective tissue. */
  def isEquiConnected: Boolean = connectedVia(_.equiColumns.nonEmpty)

  private def connectedVia(accept: JoinEdge => Boolean): Boolean = {
    tables match {
      case Nil => true
      case first +: _ =>
        var reached = Set(first)
        var grew = true
        while (grew) {
          val next = tables.filterNot(reached.contains).filter(t =>
            edgesBetween(reached, t).exists(accept))
          grew = next.nonEmpty
          reached ++= next
        }
        reached.size == tables.size
    }
  }

  /** All equi-join columns of a table (for stats probes). */
  def joinColumnsOf(table: String): Seq[String] =
    edges.flatMap(_.columnOf(table)).map(_.name).distinct

  private def leafPlan(t: String) = block.leafPlan(t)

  /** ndv ~ rowcount heuristic for "column is a primary key". */
  def isPrimaryKey(table: String, column: String): Boolean = {
    val n = stats.rowCount(leafPlan(table))
    n > 0 && stats.distinctCount(leafPlan(table), column) >= (n * 999L) / 1000L
  }

  /** A join edge is pk/fk if one side's column is (nearly) unique. */
  def isPkFkJoin(edge: JoinEdge): Boolean = pkSideOf(edge).isDefined

  /** The pk side of an edge, if any (prefers the side with higher
    * uniqueness when both qualify). */
  def pkSideOf(edge: JoinEdge): Option[String] = edge.equiColumns.flatMap {
    case (ca, cb) =>
      val sides = Seq(ca, cb).flatMap(c => c.table.map(t => (t.identifier, c.name)))
      sides.find { case (t, col) => isPrimaryKey(t, col) }.map(_._1)
  }

  /** Edges augmented with the transitive closure of the equivalence
    * classes: table pairs connected only transitively (a=b, b=c) gain a
    * direct a=c edge, widening the join-order search space (reference:
    * add_ec_predicates, transform.py:641; joingraph flag
    * opt/_joingraph.py:393-403). The synthesized predicates reuse the
    * original attribute expressions, so enforcement still resolves. */
  def augmentedEdges: Seq[JoinEdge] = augmentFrom(edges)

  private def augmentFrom(base: Seq[JoinEdge]): Seq[JoinEdge] = {
    def classesOf(es: Seq[JoinEdge]): Seq[Set[ColumnRef]] = {
      val parent = scala.collection.mutable.Map.empty[ColumnRef, ColumnRef]
      def find(c: ColumnRef): ColumnRef = {
        val p = parent.getOrElseUpdate(c, c)
        if (p == c) c else { val r = find(p); parent(c) = r; r }
      }
      es.foreach(_.equiColumns.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      })
      parent.keys.groupBy(find).values.map(_.toSet).filter(_.size > 1).toSeq
    }
    val attrOf: Map[ColumnRef, org.apache.spark.sql.catalyst.expressions.Attribute] =
      base.flatMap { e =>
        e.equiColumns.toSeq.flatMap { case (ca, cb) =>
          e.expr match {
            case org.apache.spark.sql.catalyst.expressions.EqualTo(
              a: org.apache.spark.sql.catalyst.expressions.Attribute,
              b: org.apache.spark.sql.catalyst.expressions.Attribute) =>
              Seq(ca -> a, cb -> b)
            case _ => Nil
          }
        }
      }.toMap
    val extra = for {
      cls <- classesOf(base)
      pair <- cls.toSeq.sortBy(_.toString).combinations(2).toSeq
      Seq(x, y) = pair
      tx <- x.table.map(_.identifier).toSeq
      ty <- y.table.map(_.identifier).toSeq
      if tx != ty
      if !base.exists(_.connects(tx, ty))
      ax <- attrOf.get(x).toSeq
      ay <- attrOf.get(y).toSeq
    } yield JoinEdge(Set(tx, ty),
      org.apache.spark.sql.catalyst.expressions.EqualTo(ax, ay), Some((x, y)))
    base ++ extra.distinct
  }


  /** Non-equi join conjuncts rewritten through the attribute
    * equivalence classes (q17: `o1.o_orderkey < o2.o_orderkey` with
    * `l2.l_orderkey = o2.o_orderkey` implies `o1.o_orderkey <
    * l2.l_orderkey`, applicable one join below where the original
    * resolves). Every derived conjunct is LOGICALLY IMPLIED by the
    * original plus the equi edges, so applying it anywhere never
    * changes results — only where in the join order the constraint
    * prunes. Contract (r15): [[graft.enforce.PlanEnforcer]] compiles
    * these EXPLICITLY into the enforced plan at the deepest join where
    * they resolve, so the bound model's probe plans and step triggers
    * (which consult edges ++ derivedThetaEdges) price exactly what the
    * executed plan applies — BY CONSTRUCTION, independent of how many
    * substitution rounds Catalyst's own InferFiltersFromConstraints
    * would have managed under a given join order (one per node — a
    * class-transitive rewrite is NOT otherwise guaranteed; relying on
    * Catalyst alone made r14's probes undershoot executed actuals on
    * the sw11 class and overshoot badly once restricted to one hop).
    * Multi-table conjuncts whose substituted form lands on exactly two
    * tables are included (a cross-table residual can collapse to an
    * edge under substitution).
    */
  lazy val derivedThetaEdges: Seq[JoinEdge] = derivedFromConjuncts._1

  /** JOIN conjuncts whose class-substituted form collapses onto ONE
    * table — e.g. gw79's cross-table OR `(n1.n_regionkey = 0 OR
    * s2.s_nationkey = 12)` with `s2.s_nationkey ≡ n1.n_nationkey`
    * becoming the single-table predicate `(n1.n_regionkey = 0 OR
    * n1.n_nationkey = 12)`. Logically implied for every result row by
    * the original conjunct plus the equi edges (same argument as
    * [[derivedFilters]]), so it joins the per-table filter closure:
    * statistics, probe relations AND the enforced scans all see it.
    * Before r16 these were silently dropped (only the two-table
    * collapses were kept, as edges) — measured on gw79: every bound
    * term priced n1 at 12 rows where the executed join saw 3, a 7.3x
    * whole-tree q-error for the cms tier that no sketch could close
    * (the constraint never reached the relation being sketched). */
  private lazy val derivedConjunctFilters: Map[String, Seq[Expression]] =
    derivedFromConjuncts._2

  private lazy val derivedFromConjuncts
      : (Seq[JoinEdge], Map[String, Seq[Expression]]) = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
      ExprId}
    // attribute-level union-find over the equi edges' EqualTo sides
    val parent = scala.collection.mutable.Map.empty[ExprId, ExprId]
    val attrById = scala.collection.mutable.Map.empty[ExprId, Attribute]
    def find(id: ExprId): ExprId = {
      val p = parent.getOrElseUpdate(id, id)
      if (p == id) id else { val r = find(p); parent(id) = r; r }
    }
    edges.foreach(_.expr match {
      case EqualTo(a: Attribute, b: Attribute) =>
        attrById(a.exprId) = a; attrById(b.exprId) = b
        val (ra, rb) = (find(a.exprId), find(b.exprId))
        if (ra != rb) parent(ra) = rb
      case _ =>
    })
    val members: Map[ExprId, Seq[Attribute]] = attrById.keys.toSeq
      .groupBy(find).view.mapValues(_.map(attrById).sortBy(_.exprId.id))
      .toMap
    def tablesOf(e: Expression): Set[String] =
      e.references.toSeq.flatMap(a => block.attrToTable.get(a.exprId))
        .map(_.identifier).toSet
    def tableOf(a: Attribute): Option[String] =
      block.attrToTable.get(a.exprId).map(_.identifier)
    val sourceConjuncts = block.joinConjuncts.filter(c =>
      c.tables.size > 2 ||
        (c.tables.size == 2 && c.equiColumns(block.attrToTable).isEmpty))
    // cartesian product of per-attribute choices (itself plus class
    // members on other tables), bounded per conjunct
    val out = scala.collection.mutable.ArrayBuffer.empty[JoinEdge]
    val singles = scala.collection.mutable
      .Map.empty[String, Vector[Expression]].withDefaultValue(Vector.empty)
    val seen = scala.collection.mutable.Set.empty[(Set[String], String)]
    edges.foreach(e => seen += ((e.tables, e.expr.canonicalized.toString)))
    sourceConjuncts.foreach { c =>
      val attrs = c.expr.references.toSeq.sortBy(_.exprId.id)
      val choices = attrs.map { a =>
        val cls =
          if (parent.contains(a.exprId)) members(find(a.exprId))
          else Seq.empty
        a +: cls.filter(b => b.exprId != a.exprId &&
          tableOf(b) != tableOf(a))
      }
      if (choices.map(_.size.toLong).product <= 64L) {
        val combos = choices.foldLeft(Seq(Seq.empty[Attribute])) {
          (acc, cs) => for (m <- acc; b <- cs) yield m :+ b
        }
        combos.foreach { picked =>
          val subst = attrs.zip(picked)
            .filter { case (a, b) => a.exprId != b.exprId }
            .map { case (a, b) => a.exprId -> b }.toMap
          if (subst.nonEmpty) {
            val expr2 = c.expr.transform {
              case a: Attribute if subst.contains(a.exprId) => subst(a.exprId)
            }
            val ts2 = tablesOf(expr2)
            val key = (ts2, expr2.canonicalized.toString)
            if (ts2.size == 2 && !seen.contains(key)) {
              seen += key
              out += JoinEdge(ts2, expr2, None)
            } else if (ts2.size == 1 && expr2.deterministic &&
                !seen.contains(key)) {
              seen += key
              val t = ts2.head
              singles(t) = singles(t) :+ expr2
            }
          }
        }
      }
    }
    (out.toSeq, singles.toMap.withDefaultValue(Vector.empty))
  }

  /** Single-table FILTER conjuncts rewritten through the attribute
    * equivalence classes onto OTHER tables' member columns:
    * `n2.n_regionkey < 2` with `n2.n_regionkey = r1.r_regionkey`
    * implies `r1.r_regionkey < 2` on r1's scan. A cardinality model
    * probing the UN-derived relation overshoots every node containing
    * the implied filter (gw67's n3+r1: probed 7 rows, executed 2).
    * Each derived conjunct is logically implied by the original filter
    * plus the equi edges, so applying it anywhere never changes
    * results. Contract (r15, same as [[derivedThetaEdges]]):
    * [[graft.enforce.PlanEnforcer]] pushes the FULL closure onto the
    * compiled scans, so executed relations match the probe relations
    * by construction under every join order — Catalyst's own
    * InferFiltersFromConstraints only guarantees ONE substitution hop
    * per node, which made the closure-assuming r14 probes undershoot
    * on multi-hop chains (sw11: d3 probed 3 with the 2-hop lang
    * filter, executed 18 without it) and the one-hop-restricted
    * interim overshoot (q24: bound 1625x once the class rewrites
    * stopped reaching the scans). */
  lazy val derivedFilters: Map[String, Seq[Expression]] = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
      ExprId}
    val parent = scala.collection.mutable.Map.empty[ExprId, ExprId]
    val attrById = scala.collection.mutable.Map.empty[ExprId, Attribute]
    def find(id: ExprId): ExprId = {
      val p = parent.getOrElseUpdate(id, id)
      if (p == id) id else { val r = find(p); parent(id) = r; r }
    }
    edges.foreach(_.expr match {
      case EqualTo(a: Attribute, b: Attribute) =>
        attrById(a.exprId) = a; attrById(b.exprId) = b
        val (ra, rb) = (find(a.exprId), find(b.exprId))
        if (ra != rb) parent(ra) = rb
      case _ =>
    })
    val members: Map[ExprId, Seq[Attribute]] = attrById.keys.toSeq
      .groupBy(find).view.mapValues(_.map(attrById).sortBy(_.exprId.id))
      .toMap
    def tableOf(a: Attribute): Option[String] =
      block.attrToTable.get(a.exprId).map(_.identifier)
    val out = scala.collection.mutable.Map.empty[String, Vector[Expression]]
      .withDefaultValue(Vector.empty)
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    for {
      t <- tables
      f <- block.filtersFor(t)
      // only pure deterministic scalar conjuncts propagate (a subquery
      // predicate is not a scan-pushable constraint)
      if f.deterministic && !f.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
          .PlanExpression[_]])
      attrs = f.references.toSeq.sortBy(_.exprId.id)
      if attrs.nonEmpty && attrs.forall(a => parent.contains(a.exprId))
    } {
      val choices = attrs.map { a =>
        members(find(a.exprId)).filter(b =>
          b.exprId != a.exprId && tableOf(b) != tableOf(a))
      }
      if (choices.nonEmpty && choices.forall(_.nonEmpty) &&
          choices.map(_.size.toLong).product <= 64L) {
        val combos = choices.foldLeft(Seq(Seq.empty[Attribute])) {
          (acc, cs) => for (m <- acc; b <- cs) yield m :+ b
        }
        combos.foreach { picked =>
          val subst = attrs.zip(picked).map { case (a, b) =>
            a.exprId -> b }.toMap
          val expr2 = f.transform {
            case a: Attribute if subst.contains(a.exprId) => subst(a.exprId)
          }
          val ts2 = expr2.references.toSeq
            .flatMap(a => block.attrToTable.get(a.exprId))
            .map(_.identifier).distinct
          ts2 match {
            case Seq(u) if u != t =>
              val key = (u, expr2.canonicalized.toString)
              if (!seen.contains(key) &&
                  !block.filtersFor(u).exists(
                    _.canonicalized == expr2.canonicalized)) {
                seen += key
                out(u) = out(u) :+ expr2
              }
            case _ =>
          }
        }
      }
    }
    // join conjuncts that collapsed onto one table under substitution
    // (see derivedConjunctFilters) join the same closure, deduplicated
    // against both the block's own filters and the substitution output
    derivedConjunctFilters.foreach { case (t, es) =>
      es.foreach { e =>
        val dup = block.filtersFor(t)
          .exists(_.canonicalized == e.canonicalized) ||
          out(t).exists(_.canonicalized == e.canonicalized)
        if (!dup) out(t) = out(t) :+ e
      }
    }
    out.toMap.withDefaultValue(Vector.empty)
  }

  /** Digest of the derivation-dependent predicate closure — the derived
    * theta edges and derived filters this graph (i.e. this code version)
    * produces for the query. A measured per-node actual is only
    * meaningful relative to the closure in force when it was executed:
    * derived predicates change subset-join outputs, so a value measured
    * under one derivation set must never be transplanted onto a key
    * built under another (the r16 feedback loop stamps entries with
    * this digest and skips seeding on mismatch — without it, a future
    * closure NARROWING would seed counts BELOW the new true subset
    * cardinalities, poisoning the bound cache with undercounts).
    * 48 bits so the value is exactly representable as a Double (it
    * rides the kit-actuals node map). */
  lazy val closureDigest: Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val parts = (derivedThetaEdges.map(e =>
        e.tables.toSeq.sorted.mkString(",") + "|" +
          e.expr.canonicalized.toString) ++
      derivedFilters.toSeq.flatMap { case (t, es) =>
        es.map(t + "|" + _.canonicalized.toString) }).sorted
    parts.foreach(x => md.update(x.getBytes("UTF-8")))
    (java.nio.ByteBuffer.wrap(md.digest()).getLong &
      ((1L << 48) - 1)).toDouble
  }

  /** Transitive closure of equi-join columns (union-find), the basis for
    * predicate augmentation (reference: determine_join_equivalence_classes,
    * /root/reference/postbound/qal/_qal.py:3557). */
  def equivalenceClasses: Seq[Set[ColumnRef]] = {
    val parent = scala.collection.mutable.Map.empty[ColumnRef, ColumnRef]
    def find(c: ColumnRef): ColumnRef = {
      val p = parent.getOrElseUpdate(c, c)
      if (p == c) c else { val r = find(p); parent(c) = r; r }
    }
    edges.foreach(_.equiColumns.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    })
    parent.keys.groupBy(find).values.map(_.toSet).filter(_.size > 1).toSeq
  }
}

