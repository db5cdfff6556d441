package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.enforce.StatsOverrideStrategy
import graft.transforms.AugmentEquiJoinPredicates

/** Session-extensions entry point for cluster deployments: register with
  * `--conf spark.sql.extensions=graft.GraftExtensions` so every session
  * (including executor-side thrift/connect sessions) carries graft's
  * Catalyst additions without per-session imperative registration.
  *
  * Injected pieces:
  *  - [[graft.enforce.StatsOverrideStrategy]] — plans the cardinality-
  *    injection leaf ([[graft.enforce.StatsOverride]]), the analog of the
  *    reference's `Rows(... #n)` hints
  *    (/root/reference/postbound/postgres.py:2289-2301).
  *  - [[graft.transforms.AugmentEquiJoinPredicates]] — transitive equi-join
  *    closure (reference add_ec_predicates,
  *    /root/reference/postbound/transform.py:641); semantics-preserving, it
  *    only widens the optimizer's choice of join edges.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => StatsOverrideStrategy)
    ext.injectOptimizerRule(_ => AugmentEquiJoinPredicates)
    // SQL-callable custom kernels: `SELECT cosine_sim(a, b)`,
    // `SELECT rolling_hash(text)` work from any SQL surface (thrift,
    // connect) without imperative per-session registration
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.size == 2, "cosine_sim(a, b) takes two array args")
        graft.functions.CosineSimilarity(args.head, args(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.RollingHash].getName, "rolling_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.size == 1, "rolling_hash(text) takes one arg")
        graft.functions.RollingHash(args.head)
      }))
  }
}
