package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer Gram (second-moment) matrix of an embedding column —
  * G[i][j] = Σ_v m_vi · m_vj over milli-quantized vectors
  * (m = floor(v·10³ + 0.5), the [[graft.queries.VecOps]] exactness
  * convention). The covariance/PCA/whitening primitive of an embedding
  * lake: the matrix is dims² longs (64² = 4 KB here), so the SCALABLE
  * shape is this typed Aggregator — each task folds its vectors into a
  * flat local array (one multiply-add per dim pair, no row explosion),
  * partials merge by element-wise add, and only dims²-sized states
  * ever cross the wire. The naive per-pair explode (the oracle's form)
  * shuffles dims²·n rows — fine for a 500-vector oracle check,
  * unshippable at 10⁹ vectors.
  *
  * Integer sums are associative, so the result is exact and
  * partition-order independent. Overflow headroom: |m| ≤ 10³·|v|, so a
  * cell accumulates ≤ n·(10³·|v|)² — under 2⁶³ until ~10¹² vectors at
  * |v| ≤ 3, ~10¹⁰ at |v| ≤ 30. Past that, shard the sum by vec_id
  * ranges and widen to decimal (JVM long arithmetic WRAPS silently
  * here, it does not throw).
  */
object GramMatrix {

  final class Agg(dims: Int) extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](dims * dims)

    override def reduce(b: Array[Long], v: Seq[Double]): Array[Long] = {
      val m = new Array[Long](dims)
      var i = 0
      while (i < dims && i < v.length) {
        m(i) = math.floor(v(i) * 1000 + 0.5).toLong; i += 1
      }
      i = 0
      while (i < dims) {
        val mi = m(i)
        if (mi != 0) {
          var j = 0
          val row = i * dims
          while (j < dims) { b(row + j) += mi * m(j); j += 1 }
        }
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def agg(dims: Int) = new Agg(dims)
}
