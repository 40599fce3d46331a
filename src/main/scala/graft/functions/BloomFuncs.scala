package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, BloomFilterMightContain}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL names for Spark's own runtime-filter expression pair, which the
  * stock function registry does not expose: `BloomFilterAggregate`
  * builds a bloom filter over (hashed) join keys as a single binary
  * value, and `BloomFilterMightContain` probes it. Catalyst uses the
  * pair internally for `InjectRuntimeFilter`, but that rule only fires
  * on shuffle-join plans whose creation side clears size thresholds —
  * at bench scale the dim side auto-broadcasts and the rule never
  * triggers, and on a cluster the thresholds make the pruning
  * best-effort. Registering the expressions lets a query DECLARE the
  * bloom prefilter (`join_bloom_prefilter`), so the pruned-fact-scan
  * plan is deterministic at every scale and join strategy.
  *
  * `graft_might_contain` inherits the stock expression's contract: the
  * filter argument must be a constant or an uncorrelated scalar
  * subquery (the deserialized bloom is cached once per task, never
  * per row), so queries pass the aggregate as `(SELECT
  * graft_bloom_agg(...) FROM ...)`. Values are probed as xxhash64
  * longs, the same discipline as the injected form.
  */
object BloomFuncs {

  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (c: Seq[Expression]) => c match {
        case Seq(v)       => new BloomFilterAggregate(v)
        case Seq(v, n, b) => new BloomFilterAggregate(v, n, b)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(value[, estimatedItems, numBits])")
      }),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (c: Seq[Expression]) => new BloomFilterMightContain(c(0), c(1))))

  /** Idempotently register both functions with a session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
