package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHash16, SimHash64, SortedIntersectSize, SortedLongIntersectSize}

/** Cluster-grade registration of the engine's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects `dotp` and `sorted_intersect_size` into every session on the
  * cluster at session build time — the deployment path for 100 TB runs.
  * Local/test code paths reach the same expressions through
  * `VectorExprs.register(spark)` (idempotent, per-session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProduct].getName, "dotp"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_long_intersect_size"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName, "sorted_long_intersect_size"),
      (children: Seq[Expression]) => SortedLongIntersectSize(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
      (children: Seq[Expression]) => MinHash16(children.head)))
  }
}
