package graft

/** Prints the bench's execution order (SparkEntry.queries.toSeq map
  * order — deterministic for a fixed entry set) so run-order-correlated
  * effects (contended windows, JIT code-cache overflow) can be mapped
  * back onto per-entry artifacts. No Spark session needed.
  */
object OrderDump {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.toSeq.map(_._1).zipWithIndex.foreach {
      case (n, i) => println(s"ORDER $i $n")
    }
}
