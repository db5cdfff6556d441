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
}
