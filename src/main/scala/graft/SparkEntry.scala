package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Relational, Funcs, TimeSeriesQ, TextOps, VecOps, ExtensibilityOps, IndexOps, IvfIndex, PqIndex, PipelineOps, EmbedOps, TokenizerOps, QualityOps, GraphOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator implementations live in `graft.queries.*` as
  * `Core.Entry(name, fn, oracle)` values; this object just aggregates
  * them into the driver's two Maps. Names are unique by construction
  * (asserted below) so a duplicate registration fails fast at class
  * init instead of silently shadowing an operator.
  */
object SparkEntry {
  private val all: Seq[Core.Entry] =
    Relational.entries ++ Funcs.entries ++ TimeSeriesQ.entries ++
      TextOps.entries ++ VecOps.entries ++ ExtensibilityOps.entries ++
      IndexOps.entries ++ IvfIndex.entries ++ PqIndex.entries ++ PipelineOps.entries ++
      EmbedOps.entries ++ TokenizerOps.entries ++ QualityOps.entries ++ GraphOps.entries

  require(all.map(_.name).distinct.size == all.size,
    s"duplicate entry names: ${all.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }.mkString(",")}")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q1-style pricing-summary aggregation (reference query path:
    * engine.py:58-63 one-table SQL surface).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
