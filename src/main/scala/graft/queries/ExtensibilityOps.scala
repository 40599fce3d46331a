package graft.queries

import org.apache.spark.sql.functions._
import graft.Core._
import graft.functions.Welford

/** SURVEY.md §2.11 extensibility rows exercised as declared operators.
  * Q-gated: the Welford UDAF's float-op order differs from the oracle
  * engine's variance algorithm, so equality is asserted in ScalaTest
  * against Spark's built-ins (1e-9 relative) rather than hash-compared.
  */
object ExtensibilityOps {

  val entries: Seq[Entry] = Seq(

    entryNoOracle("agg_welford_udaf") { (s, dir) =>
      import s.implicits._
      // Typed Aggregator (single-pass Welford) per order-priority group:
      // one shuffle, partial states merged associatively — the scalable
      // form of the reference's two-pass AVG/STDDEV rule (agent.py:65).
      val wf = udaf(Welford.agg)
      load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(wf($"o_totalprice").as("st"))
        .select($"o_orderpriority",
          $"st.n".as("n"),
          round($"st.mean", 4).as("mean"),
          round($"st.stddev", 4).as("stddev"))
        .orderBy($"o_orderpriority")
    }
  )
}
