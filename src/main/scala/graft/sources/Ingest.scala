package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion / serving edges (SURVEY.md §2.2; reference DataIngestor
  * engine.py:17-37 front door and the app's serving panel
  * app.py:231,247-248).
  *
  * Schema policy mirrors the reference's bronze-layer intent: dynamic
  * (inferred) at the CSV/JSON edge, authoritative once parquet.
  *
  * Scale notes: `inferSchema` double-scans the input — at 100 TB pass an
  * explicit schema (both readers accept one); writers partition by the
  * natural key when told to. Nothing here collects to the driver except
  * `serveJsonHead`, which is an explicitly bounded head-N serve point.
  */
object Ingest {

  /** CSV → DataFrame, header + inferred schema (engine.py:23-24). */
  def readCsv(spark: SparkSession, path: String,
              schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schemaDdl match {
      case Some(ddl) => r.schema(ddl).csv(path)
      case None      => r.option("inferSchema", "true").csv(path)
    }
  }

  /** JSON-lines (or multiline array) → DataFrame (engine.py:27-28). */
  def readJson(spark: SparkSession, path: String,
               multiLine: Boolean = false): DataFrame =
    spark.read.option("multiLine", multiLine.toString).json(path)

  /** Bronze persist: `{name}.parquet` per dataset (engine.py:46-50). */
  def writeBronze(df: DataFrame, lakeDir: String, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$lakeDir/$name.parquet")

  /** Partitioned bronze persist: hive-layout `col=value/` directories on
    * the partition columns. THE lake-layout decision at 100 TB — a scan
    * filtered on a partition column prunes to the matching directories
    * before reading a byte (PartitionFilters in the scan, asserted in
    * IngestSpec), so per-lang / per-day jobs touch only their slice.
    * Partition columns must be low-cardinality (lang, date); high-
    * cardinality keys belong in bucketBy, not partitionBy (a directory
    * per value kills the file system first).
    */
  def writeBronzePartitioned(df: DataFrame, lakeDir: String, name: String,
                             partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(s"$lakeDir/$name.parquet")

  /** CSV export with header (app.py:247-248). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Head-N JSON serve (app.py:231): deterministic order, bounded N —
    * the single place a result is allowed to reach the driver.
    */
  def serveJsonHead(df: DataFrame, orderCol: String, n: Int): Seq[String] =
    df.orderBy(col(orderCol)).limit(n).toJSON.collect().toSeq

  /** ORC lake edge (built into spark-sql — the columnar sibling of the
    * parquet bronze layer for lakes standardized on ORC).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, lakeDir: String, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(s"$lakeDir/$name.orc")

  /** Excel ingestion is a documented out-of-engine converter in this
    * offline build (no spark-excel jar; SURVEY.md §7.4): convert
    * `.xlsx` → CSV upstream, then `readCsv`. Kept as an explicit,
    * named seam so a jar-enabled build swaps in `format("excel")`.
    */
  def readExcelViaCsv(spark: SparkSession, convertedCsvPath: String): DataFrame =
    readCsv(spark, convertedCsvPath)

  /** PDF ingestion (engine.py:29-33, one row per page): binary front
    * door is `format("binaryFile")`; text extraction is a stubbed seam
    * (no pdf lib offline). The deterministic stand-in derives one
    * "page" per 1024-byte slice so the (path, page, content) plumbing
    * and partitioning are real and testable.
    */
  def readPdfPages(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), base64(col("content")).as("b64"))
    bin.select(
        col("path"),
        posexplode(expr(
          """transform(sequence(0, greatest(int(ceil(length(b64) / 1024.0)) - 1, 0)),
            |          i -> substring(b64, i * 1024 + 1, 1024))""".stripMargin))
          .as(Seq("page", "content")))
      .withColumn("page", col("page") + 1)
  }
}
