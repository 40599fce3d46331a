package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Cluster-grade registration of the engine's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects every native function (dotp, sorted[_long]_intersect_size,
  * simhash64, minhash16) into every session on the
  * cluster at session build time — the deployment path for 100 TB runs.
  * Local/test code paths reach the same expressions through
  * `VectorExprs.register(spark)` (idempotent, per-session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.VectorExprs.registrations.foreach(ext.injectFunction)
}
