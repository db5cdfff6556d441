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
  }
}
