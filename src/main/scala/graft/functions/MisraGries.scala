package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed, merge-associative
  * `Aggregator` (SURVEY.md §2.11 extensibility surface; Misra & Gries
  * 1982, merge rule per Agarwal et al., "Mergeable Summaries", PODS
  * 2012 — both public literature).
  *
  * State is k (item, count) pairs regardless of stream length or item
  * cardinality. Guarantees after any partitioning/merge order:
  *   - no over-count: est(x) ≤ true(x)
  *   - bounded under-count: true(x) − est(x) ≤ n/(k+1)  (n = stream size)
  * so every item with true frequency > n/(k+1) is present in the final
  * sketch — the candidate-superset property the exact-confirm pass in
  * `agg_heavy_hitters` relies on.
  *
  * The buffer is a pair of parallel arrays (product-encodable without
  * internal encoder APIs); k is small (≤ a few hundred) so the O(k)
  * per-row probe stays cache-resident.
  */
object MisraGries {

  final case class Sketch(keys: Array[String], counts: Array[Long])

  def agg(k: Int): Aggregator[String, Sketch, Sketch] =
    new Aggregator[String, Sketch, Sketch] {
      override def zero: Sketch = Sketch(Array.empty, Array.empty)

      override def reduce(b: Sketch, x: String): Sketch = {
        val i = b.keys.indexOf(x)
        if (i >= 0) {
          val c = b.counts.clone(); c(i) += 1
          Sketch(b.keys, c)
        } else if (b.keys.length < k) {
          Sketch(b.keys :+ x, b.counts :+ 1L)
        } else {
          // full and x absent: decrement every counter (x's implicit +1
          // and k decrements cancel k+1 stream items — the error unit)
          val keep = b.counts.count(_ > 1)
          val ks = new Array[String](keep); val cs = new Array[Long](keep)
          var j = 0; var o = 0
          while (j < b.counts.length) {
            if (b.counts(j) > 1) { ks(o) = b.keys(j); cs(o) = b.counts(j) - 1; o += 1 }
            j += 1
          }
          Sketch(ks, cs)
        }
      }

      override def merge(a: Sketch, b: Sketch): Sketch = {
        if (a.keys.isEmpty) return b
        if (b.keys.isEmpty) return a
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        var j = 0
        while (j < a.keys.length) { m.update(a.keys(j), m.getOrElse(a.keys(j), 0L) + a.counts(j)); j += 1 }
        j = 0
        while (j < b.keys.length) { m.update(b.keys(j), m.getOrElse(b.keys(j), 0L) + b.counts(j)); j += 1 }
        if (m.size <= k) Sketch(m.keys.toArray, m.values.toArray)
        else {
          // subtract the (k+1)-th largest count, drop what hits zero —
          // the mergeable-summaries rule that keeps the n/(k+1) bound
          val cut = m.values.toArray.sorted(Ordering[Long].reverse)(k)
          val kept = m.iterator.map { case (key, c) => key -> (c - cut) }.filter(_._2 > 0).toArray
          Sketch(kept.map(_._1), kept.map(_._2))
        }
      }

      override def finish(s: Sketch): Sketch = s

      override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
      override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    }
}
