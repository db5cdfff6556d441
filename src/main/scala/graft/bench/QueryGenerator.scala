package graft.bench

import scala.util.Random

/** CEB-style random SPJ query generation over the test star schema
  * (reference: postbound/experiments/ceb.py — template-driven query
  * generation for cardinality-estimation benchmarks). Queries are built
  * from a random connected subgraph of the pk/fk join graph plus random
  * filters, so every generated query is executable and optimizable; used
  * to fuzz optimization pipelines against native execution.
  */
object QueryGenerator {

  /** pk/fk edges of the fixture schema (FIXTURES.md §1). */
  val schemaEdges: Seq[(String, String, String, String)] = Seq(
    ("region", "r_regionkey", "nation", "n_regionkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("nation", "n_nationkey", "supplier", "s_nationkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier", "s_suppkey", "lineitem", "l_suppkey"))

  /** Numeric filter candidates per table: (column, lo, hi). */
  private val filterCols: Map[String, (String, Double, Double)] = Map(
    "customer" -> (("c_acctbal", -999.0, 9999.0)),
    "supplier" -> (("s_acctbal", -999.0, 9999.0)),
    "orders" -> (("o_totalprice", 1000.0, 300000.0)),
    "lineitem" -> (("l_quantity", 1.0, 50.0)),
    "part" -> (("p_size", 1.0, 50.0)),
    "nation" -> (("n_nationkey", 0.0, 24.0)),
    "region" -> (("r_regionkey", 0.0, 4.0)))

  /** Generate a random connected SPJ aggregate query. Deterministic for a
    * given seed. */
  def randomQuery(seed: Long, minTables: Int = 2, maxTables: Int = 5): String = {
    val rnd = new Random(seed)
    val nTables = minTables + rnd.nextInt(maxTables - minTables + 1)
    // random connected subgraph: start anywhere, grow along schema edges
    val allTables = schemaEdges.flatMap(e => Seq(e._1, e._3)).distinct
    var tables = Set(allTables(rnd.nextInt(allTables.size)))
    var edges = Seq.empty[(String, String, String, String)]
    var progress = true
    while (tables.size < nTables && progress) {
      val candidates = schemaEdges.filter(e =>
        tables.contains(e._1) ^ tables.contains(e._3))
      if (candidates.isEmpty) progress = false
      else {
        val e = candidates(rnd.nextInt(candidates.size))
        edges :+= e
        tables ++= Seq(e._1, e._3)
      }
    }
    val joinConds = edges.map(e => s"${e._2} = ${e._4}")
    // random filters on a random subset of tables
    val filters = tables.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.5)
      .flatMap { t =>
        filterCols.get(t).map { case (c, lo, hi) =>
          val cut = lo + rnd.nextDouble() * (hi - lo)
          val op = if (rnd.nextBoolean()) "<" else ">"
          f"$c $op $cut%.2f"
        }
      }
    val where = (joinConds ++ filters).mkString(" AND ")
    val groupTable = tables.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val groupCol = Map(
      "customer" -> "c_mktsegment", "supplier" -> "s_nationkey",
      "orders" -> "o_orderstatus", "lineitem" -> "l_returnflag",
      "part" -> "p_brand", "nation" -> "n_name", "region" -> "r_name")(groupTable)
    s"""SELECT $groupCol, count(*) AS n FROM ${tables.toSeq.sorted.mkString(", ")}
       WHERE $where GROUP BY $groupCol ORDER BY $groupCol"""
  }

  def randomWorkload(name: String, n: Int, seed: Long = 42L): Workload =
    Workload.inline(name,
      (1 to n).map(i => f"gen$i%03d" -> randomQuery(seed + i)): _*)

  // ------------------------------------------------- FK random-walk walk

  /** Where filter literals come from: the reference samples each
    * filtered column's DISTINCT VALUES from the live database
    * (querygen.py `_generate_filter`, `SELECT DISTINCT {col} FROM {tab}`).
    * [[DataValueSource]] is that route on Spark; [[FixtureValueSource]]
    * carries the fixture schema's scale-stable domains statically so a
    * generated workload (and its oracle text) can be assembled without a
    * session — the same split the CEB generator's list-typed templates
    * use.
    */
  trait ValueSource {
    /** Distinct values of `table.column`, already rendered as SQL
      * literals (strings quoted, numerics bare). */
    def distinctValues(table: String, column: String): Seq[String]
  }

  /** Filterable columns per table: low-cardinality value columns (the
    * reference's `filter_key_columns = False` mode — join keys carry the
    * FK predicates instead). */
  val filterCatalog: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_name"),
    "nation" -> Seq("n_name", "n_regionkey"),
    "customer" -> Seq("c_mktsegment"),
    "supplier" -> Seq("s_nationkey"),
    "part" -> Seq("p_brand", "p_type", "p_size"),
    "orders" -> Seq("o_orderstatus", "o_orderpriority"),
    "lineitem" -> Seq("l_returnflag", "l_linestatus", "l_quantity"))

  /** The fixture's categorical/numeric domains, identical at every scale
    * factor (verified sf0.001 vs sf0.1), rendered as SQL literals. */
  object FixtureValueSource extends ValueSource {
    private def q(vs: Seq[String]): Seq[String] = vs.map(v => s"'$v'")
    private val domains: Map[(String, String), Seq[String]] = Map(
      ("region", "r_name") ->
        q(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")),
      ("nation", "n_name") -> q((0 until 25).map(i => s"NATION_$i")),
      ("nation", "n_regionkey") -> (0 until 5).map(_.toString),
      ("customer", "c_mktsegment") -> q(Seq("AUTOMOBILE", "BUILDING",
        "FURNITURE", "HOUSEHOLD", "MACHINERY")),
      ("supplier", "s_nationkey") -> (0 until 25).map(_.toString),
      ("part", "p_brand") -> q((1 to 25).map(i => s"Brand#$i")),
      ("part", "p_type") -> q(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO",
        "SMALL", "STANDARD")),
      ("part", "p_size") -> (1 to 50).map(_.toString),
      ("orders", "o_orderstatus") -> q(Seq("F", "O", "P")),
      ("orders", "o_orderpriority") -> q(Seq("1-URGENT", "2-HIGH",
        "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      ("lineitem", "l_returnflag") -> q(Seq("A", "N", "R")),
      ("lineitem", "l_linestatus") -> q(Seq("F", "O")),
      ("lineitem", "l_quantity") -> (1 to 50).map(_.toString))
    def distinctValues(table: String, column: String): Seq[String] =
      domains((table, column))
  }

  /** Live distinct-value sampling through a SparkSession — the
    * reference's `SELECT DISTINCT` route, capped so a high-cardinality
    * column cannot flood the generator (the reference TABLESAMPLEs for
    * the same reason). */
  final class DataValueSource(spark: org.apache.spark.sql.SparkSession,
      dir: String, cap: Int = 64) extends ValueSource {
    def distinctValues(table: String, column: String): Seq[String] = {
      val rows = graft.Tables.load(spark, dir, table)
        .select(column).distinct().orderBy(column).limit(cap).collect()
      rows.toSeq.map(_.get(0)).collect {
        case s: String => s"'${s.replace("'", "''")}'"
        case n => n.toString
      }
    }
  }

  /** Random walk over the undirected FK graph with shell jumps: each
    * step moves to a uniformly random UNVISITED neighbor of ANY visited
    * node (not just the current one) — the reference's modified
    * `nx_random_walk` (/root/reference/postbound/util/nx.py:75-130),
    * which guarantees every prefix of the walk is a connected table set.
    */
  def randomWalkTables(rnd: Random, nTables: Int): Seq[String] = {
    val adj: Map[String, Set[String]] = schemaEdges
      .flatMap(e => Seq(e._1 -> e._3, e._3 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val allTables = adj.keys.toSeq.sorted
    var current = allTables(rnd.nextInt(allTables.size))
    val visited = scala.collection.mutable.LinkedHashSet(current)
    val shell = scala.collection.mutable.SortedSet.empty[String]
    while (visited.size < nTables && visited.size < allTables.size) {
      shell ++= adj(current).diff(visited)
      val pick = shell.toSeq.apply(rnd.nextInt(shell.size))
      shell -= pick
      visited += pick
      current = pick
    }
    visited.toSeq
  }

  /** Equi-join predicates for EVERY FK-connected pair among `tables` —
    * not just the walk tree — mirroring querygen.py
    * `_generate_join_predicates` (each pair checked once, both FK
    * directions). The walk guarantees at least a spanning set exists.
    */
  def fkJoinPredicates(tables: Seq[String]): Seq[String] =
    for {
      i <- tables.indices; j <- (i + 1) until tables.size
      e <- schemaEdges.find(e =>
        (e._1 == tables(i) && e._3 == tables(j)) ||
          (e._1 == tables(j) && e._3 == tables(i)))
    } yield s"${e._2} = ${e._4}"

  /** One random FK-walk query (querygen.py `generate_query`):
    * walk-selected connected tables, all-pairs FK join predicates,
    * `nFilters` filters on randomly sampled catalog columns with
    * operators drawn from {=, <>, >, <} and literals drawn from the
    * column's distinct values. `countStar` wraps the SELECT clause as
    * COUNT(*) — the cardinality-experiment shape the reference generates
    * for. Deterministic per (seed, values).
    */
  def randomWalkQuery(seed: Long, minTables: Int = 2, maxTables: Int = 5,
      minFilters: Int = 1, maxFilters: Int = 3, countStar: Boolean = true,
      values: ValueSource = FixtureValueSource): String = {
    val rnd = new Random(seed)
    val nTables = minTables + rnd.nextInt(maxTables - minTables + 1)
    val tables = randomWalkTables(rnd, nTables)
    val joins = fkJoinPredicates(tables)
    val available = tables.sorted.flatMap(t =>
      filterCatalog.getOrElse(t, Seq.empty).map(c => (t, c)))
    val nFilters = math.min(
      minFilters + rnd.nextInt(maxFilters - minFilters + 1), available.size)
    val ops = Seq("=", "<>", ">", "<")
    val filters = rnd.shuffle(available).take(nFilters).map { case (t, c) =>
      val op = ops(rnd.nextInt(ops.size))
      val domain = values.distinctValues(t, c)
      s"$c $op ${domain(rnd.nextInt(domain.size))}"
    }
    val select = if (countStar) "count(*) AS n" else "*"
    val where = joins ++ filters
    s"SELECT $select FROM ${tables.sorted.mkString(", ")}" +
      (if (where.isEmpty) "" else s" WHERE ${where.mkString(" AND ")}")
  }

  /** N FK-walk queries as a labeled workload, deterministic in seed. */
  def randomWalkWorkload(name: String, n: Int, seed: Long = 42L,
      values: ValueSource = FixtureValueSource): Workload =
    Workload.inline(name,
      (1 to n).map(i =>
        f"walk$i%03d" -> randomWalkQuery(seed + i, values = values)): _*)

  // ------------------------------------------------ aliased repeat walks

  /** Alias prefix per table (the fixture's initials are unique). */
  private val aliasPrefix: Map[String, String] = Map(
    "region" -> "r", "nation" -> "n", "customer" -> "c",
    "supplier" -> "s", "part" -> "p", "orders" -> "o",
    "lineitem" -> "l", "events" -> "e")

  /** Schema edges including the `events` stream table (user activity
    * FK-joins the customer dimension; verified user_id ⊆ c_custkey on
    * the fixtures). */
  val schemaEdgesWithEvents: Seq[(String, String, String, String)] =
    schemaEdges :+ (("customer", "c_custkey", "events", "user_id"))

  /** Filterable columns including the events table. */
  val filterCatalogWithEvents: Map[String, Seq[String]] =
    filterCatalog + ("events" -> Seq("event_type"))

  /** Event-type domain for [[FixtureValueSource]]-style literal
    * sampling (scale-stable like the TPC-H domains). */
  private val eventTypeDomain: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view").map(v => s"'$v'")

  /** One aliased FK random-walk query — JOB's defining shape: repeated
    * relations under fresh aliases with selective dimension filters
    * (reference: the JOB loader's aliased queries,
    * /root/reference/postbound/workloads.py:936-980). Each step
    * attaches a NEW alias of a schema neighbor of a uniformly random
    * already-placed alias (shell-jump walk), so tables repeat (≤3
    * aliases per table) and every seed draws its own join GRAPH — the
    * r12 generated batch varied only filters over one fixed 7-table
    * graph. With `crossOrFilter` one disjunction spans two distinct
    * aliases (the q32-class cross-table OR frontier); with
    * `includeEvents` the walk may cross into the events stream table.
    * Deterministic per (seed, values). */
  def aliasWalkQuery(seed: Long, minTables: Int = 8, maxTables: Int = 13,
      minFilters: Int = 2, maxFilters: Int = 4,
      crossOrFilter: Boolean = false, includeEvents: Boolean = false,
      values: ValueSource = FixtureValueSource): String = {
    val rnd = new Random(seed)
    val edges0 = if (includeEvents) schemaEdgesWithEvents else schemaEdges
    val catalog = if (includeEvents) filterCatalogWithEvents else filterCatalog
    // table -> (neighbor table, my column, neighbor's column)
    val adj: Map[String, Seq[(String, String, String)]] = edges0
      .flatMap(e => Seq(e._1 -> ((e._3, e._2, e._4)),
        e._3 -> ((e._1, e._4, e._2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_.toString) }
    val nTables = minTables + rnd.nextInt(maxTables - minTables + 1)
    val tableCount = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    final case class Inst(alias: String, table: String)
    def newInst(t: String): Inst = {
      tableCount(t) += 1
      Inst(s"${aliasPrefix(t)}${tableCount(t)}", t)
    }
    val tables0 = adj.keys.toSeq.sorted
    var insts = Vector(newInst(tables0(rnd.nextInt(tables0.size))))
    var joins = Vector.empty[String]
    var guard = 0
    while (insts.size < nTables && guard < 200) {
      guard += 1
      val a = insts(rnd.nextInt(insts.size))
      val nbrs = adj(a.table)
      val (nt, myCol, theirCol) = nbrs(rnd.nextInt(nbrs.size))
      if (tableCount(nt) < 3) {
        val b = newInst(nt)
        insts :+= b
        joins :+= s"${b.alias}.$theirCol = ${a.alias}.$myCol"
      }
    }
    def domain(t: String, c: String): Seq[String] =
      if (t == "events" && c == "event_type") eventTypeDomain
      else values.distinctValues(t, c)
    def lit(i: Inst, c: String): String = {
      val d = domain(i.table, c); d(rnd.nextInt(d.size))
    }
    val available = insts.flatMap(i =>
      catalog.getOrElse(i.table, Seq.empty).map(c => (i, c)))
    val nFilters = math.min(
      minFilters + rnd.nextInt(maxFilters - minFilters + 1), available.size)
    val picks = rnd.shuffle(available)
      .take(nFilters + (if (crossOrFilter) 2 else 0))
    val (orPicks, plainPicks) =
      if (crossOrFilter && picks.size >= 2) (picks.take(2), picks.drop(2))
      else (Vector.empty[(Inst, String)], picks)
    val orClause = orPicks match {
      case Vector((i1, c1), (i2, c2)) if i1.alias != i2.alias =>
        Some(s"(${i1.alias}.$c1 = ${lit(i1, c1)} OR ${i2.alias}.$c2 = ${lit(i2, c2)})")
      case _ => None
    }
    val ops = Seq("=", "<>", ">", "<")
    val filters = plainPicks.map { case (i, c) =>
      s"${i.alias}.$c ${ops(rnd.nextInt(ops.size))} ${lit(i, c)}"
    }
    val from = insts.map(i => s"${i.table} ${i.alias}").mkString(", ")
    val where = (joins ++ filters ++ orClause.toSeq).mkString(" AND ")
    s"SELECT count(*) AS n FROM $from WHERE $where"
  }

  // ------------------------------------------------- stats-schema walks

  /** The Stats-CEB-style schema graph (reference: the Stats workload,
    * /root/reference/postbound/workloads.py:1124-1149 — 146 queries over
    * the Stack Exchange activity schema, Han et al. VLDB'21). Its
    * defining traits re-expressed on the fixtures: an activity fact
    * (`events`, ~67 rows per user) self-joining and FK-ing a user
    * dimension chain (customer→nation→region) — the votes/comments/
    * badges-all-FK-users shape — plus the corpus component (documents
    * 1:1 embeddings) with LOW-NDV n:m self-join keys (label ndv 10,
    * lang ndv 5) where independence-assuming estimators explode.
    * Self edges (same table on both sides) let a walk place several
    * aliases of the fact joined directly on the hub key. */
  val statsSchemaEdges: Seq[(String, String, String, String)] = Seq(
    ("region", "r_regionkey", "nation", "n_regionkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("customer", "c_custkey", "events", "user_id"),
    ("events", "user_id", "events", "user_id"),
    ("documents", "doc_id", "embeddings", "vec_id"),
    ("embeddings", "label", "embeddings", "label"),
    ("documents", "lang", "documents", "lang"))

  /** Per-table alias caps for [[statsWalkQuery]]: the fact and corpus
    * tables repeat (Stats queries join up to 4 activity relations onto
    * one user), dimensions do not. */
  private val statsAliasCap: Map[String, Int] = Map(
    "events" -> 4, "embeddings" -> 3, "documents" -> 3,
    "customer" -> 2, "nation" -> 1, "region" -> 1)

  /** Filterable columns of the stats schema; `>`/`<` on the numeric
    * band columns, `=`/`<>` on categoricals. */
  private val statsFilterCatalog: Map[String, Seq[String]] = Map(
    "events" -> Seq("event_type", "value"),
    "customer" -> Seq("c_mktsegment"),
    "nation" -> Seq("n_regionkey"),
    "region" -> Seq("r_name"),
    "documents" -> Seq("lang", "source", "n_chars"),
    "embeddings" -> Seq("label"))

  private val statsNumericCols = Set("value", "n_chars", "label",
    "n_regionkey")

  /** Scale-stable literal domains of the stats-schema columns (verified
    * identical sf0.01 vs sf0.1, like [[FixtureValueSource]]'s). */
  private val statsDomains: Map[(String, String), Seq[String]] = Map(
    ("events", "event_type") ->
      Seq("click", "error", "purchase", "signup", "view").map(v => s"'$v'"),
    ("events", "value") -> (50 to 450 by 50).map(_.toString),
    ("documents", "lang") ->
      Seq("de", "en", "es", "fr", "zh").map(v => s"'$v'"),
    ("documents", "source") -> (0 until 20).map(i => s"'src$i'"),
    ("documents", "n_chars") -> (100 to 500 by 50).map(_.toString),
    ("embeddings", "label") -> (0 to 9).map(_.toString))

  /** One aliased walk query over [[statsSchemaEdges]] — the Stats kit's
    * generated breadth, mirroring [[aliasWalkQuery]]'s design (shell-
    * jump walk, fresh alias per step, deterministic per seed) with the
    * Stats traits: correlated MULTI-filter tables (two filters may land
    * on one alias — the joint-selectivity stress Han et al. built the
    * benchmark around) and low-ndv n:m self joins. */
  def statsWalkQuery(seed: Long, minTables: Int = 3, maxTables: Int = 7,
      minFilters: Int = 2, maxFilters: Int = 5,
      values: ValueSource = FixtureValueSource): String = {
    val rnd = new Random(seed)
    // table -> (neighbor table, my column, neighbor's column); a self
    // edge contributes one entry joining a fresh alias of the same table
    val adj: Map[String, Seq[(String, String, String)]] = statsSchemaEdges
      .flatMap(e =>
        if (e._1 == e._3) Seq(e._1 -> ((e._3, e._2, e._4)))
        else Seq(e._1 -> ((e._3, e._2, e._4)), e._3 -> ((e._1, e._4, e._2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_.toString) }
    val prefix = Map("region" -> "r", "nation" -> "n", "customer" -> "c",
      "events" -> "e", "documents" -> "d", "embeddings" -> "v")
    val nTables = minTables + rnd.nextInt(maxTables - minTables + 1)
    val tableCount = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    final case class Inst(alias: String, table: String)
    def newInst(t: String): Inst = {
      tableCount(t) += 1
      Inst(s"${prefix(t)}${tableCount(t)}", t)
    }
    // start on a repeatable table so short walks still draw the kit's
    // defining self-join/fact shapes rather than dimension-only chains
    val starts = Seq("events", "documents", "embeddings")
    var insts = Vector(newInst(starts(rnd.nextInt(starts.size))))
    var joins = Vector.empty[String]
    var guard = 0
    while (insts.size < nTables && guard < 200) {
      guard += 1
      val a = insts(rnd.nextInt(insts.size))
      val nbrs = adj(a.table)
      val (nt, myCol, theirCol) = nbrs(rnd.nextInt(nbrs.size))
      if (tableCount(nt) < statsAliasCap(nt)) {
        val b = newInst(nt)
        insts :+= b
        joins :+= s"${b.alias}.$theirCol = ${a.alias}.$myCol"
      }
    }
    def domain(t: String, c: String): Seq[String] =
      statsDomains.getOrElse((t, c), values.distinctValues(t, c))
    val available = insts.flatMap(i =>
      statsFilterCatalog.getOrElse(i.table, Seq.empty).map(c => (i, c)))
    val nFilters = math.min(
      minFilters + rnd.nextInt(maxFilters - minFilters + 1), available.size)
    val filters = rnd.shuffle(available).take(nFilters).map { case (i, c) =>
      val d = domain(i.table, c)
      val op =
        if (statsNumericCols(c)) (if (rnd.nextBoolean()) ">" else "<")
        else if (rnd.nextInt(4) == 0) "<>" else "="
      s"${i.alias}.$c $op ${d(rnd.nextInt(d.size))}"
    }
    val from = insts.map(i => s"${i.table} ${i.alias}").mkString(", ")
    val where = (joins ++ filters).mkString(" AND ")
    s"SELECT count(*) AS n FROM $from WHERE $where"
  }
}
