package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Cluster-grade registration of the engine's native expressions and
  * optimizer rules:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects every native function (dotp, sorted[_long]_intersect_size,
  * simhash64, minhash16) into every session on the
  * cluster at session build time — the deployment path for 100 TB runs —
  * plus the ANN top-k rewrite rule (graft.plans.AnnTopKRule; inert
  * unless the session opts in via spark.graft.ann.rewrite).
  * Local/test code paths reach the same expressions through
  * `VectorExprs.register(spark)` (idempotent, per-session) and the rule
  * through `AnnTopKRule.install(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.VectorExprs.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(graft.plans.AnnTopKRule(_))
  }
}
