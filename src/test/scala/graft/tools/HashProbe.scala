package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: per-node canonicalized hashCodes of a representative
  * probe plan, printed so two differently-launched JVMs can be diffed —
  * isolates which TreeNode class hashes JVM-dependently (the probe
  * cache's cross-JVM key stability depends on every node hashing
  * stably). */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.Tables.registerAll(spark, sfDir)
    val q = graft.qal.QueryFacade(spark,
      "SELECT count(*) FROM orders o2, lineitem l2 WHERE " +
        "o2.o_orderkey = l2.l_orderkey AND o2.o_orderpriority = '4-NOT SPECIFIED'")
    val b = q.joinBlock.get
    val leaf = b.leafPlan("o2")
    val filtered = org.apache.spark.sql.catalyst.plans.logical.Filter(
      graft.qal.QueryFacade.andAll(b.filtersFor("o2")).get, leaf)
    // a >=3-operand Multiply chain canonicalizes to MultiCommutativeOp
    // (stores the op as a Class[_] — the second identity-hash trap)
    val agg = {
      import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Multiply}
      import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
      import org.apache.spark.sql.catalyst.plans.logical.Aggregate
      val k = leaf.output.head
      val product = Seq(k, k, k).map(x => x: Expression).reduce(Multiply(_, _))
      Aggregate(Nil,
        Seq(Alias(Sum(product).toAggregateExpression(), "n")()), filtered)
    }
    for ((name, p) <- Seq("leaf" -> leaf, "filtered" -> filtered,
        "aggProduct" -> agg)) {
      val c = p.canonicalized
      println(s"== $name semanticHash=${p.semanticHash()} " +
        s"stable=${graft.stats.EmulatedStatistics.stableSemanticHash(c)}")
      c.foreach { n =>
        println(f"  node ${n.getClass.getSimpleName}%-24s h=${n.hashCode()}")
        n.expressions.foreach { e =>
          e.foreach { x =>
            println(f"    expr ${x.getClass.getSimpleName}%-22s h=${x.hashCode()} $x")
          }
        }
      }
    }
    spark.stop()
  }
}
