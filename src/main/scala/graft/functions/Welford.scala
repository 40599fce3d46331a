package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mean/variance via Welford's algorithm (SURVEY.md §2.11 —
  * the typed-`Aggregator` extensibility row; the statistical rule the
  * reference expresses as two SQL passes, agent.py:65).
  *
  * Numerically stable (no sum-of-squares cancellation) and
  * merge-associative, so Spark can combine partial states from any
  * partitioning — the parallel-merge form of the update is exactly the
  * two-stream Welford combination.
  */
object Welford {

  final case class State(n: Long, mean: Double, m2: Double)
  final case class Stats(n: Long, mean: Double, variance: Double, stddev: Double)

  object agg extends Aggregator[Double, State, Stats] {
    override def zero: State = State(0L, 0.0, 0.0)

    override def reduce(b: State, x: Double): State = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      State(n, mean, b.m2 + d * (x - mean))
    }

    override def merge(a: State, b: State): State = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        val mean = a.mean + d * b.n / n
        val m2 = a.m2 + b.m2 + d * d * a.n * b.n / n
        State(n, mean, m2)
      }
    }

    override def finish(s: State): Stats = {
      val variance = if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN
      Stats(s.n, s.mean, variance, math.sqrt(variance))
    }

    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
