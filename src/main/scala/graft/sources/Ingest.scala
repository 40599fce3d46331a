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

  /** Keyed upsert into a bronze table (SCD-1: new version of a key wins,
    * unmatched keys append) — the daily-ingest merge shape on a plain-
    * parquet lake. Expressed as anti-join + union: existing rows whose
    * key is NOT in the batch survive, the batch replaces the rest. The
    * result is staged to a temp dir and swapped in, because Spark cannot
    * overwrite a path that one of the plan's scans is still reading.
    * At 100 TB: both sides shuffle on the key once (or zero times with
    * a bucketed table); a format with transactional MERGE (Delta/
    * Iceberg) replaces the swap, not the plan shape.
    */
  def upsertBronze(batch: DataFrame, lakeDir: String, name: String,
                   key: String): Unit = {
    val spark = batch.sparkSession
    val path = s"$lakeDir/$name.parquet"
    val target = new java.io.File(path)
    // persist: the batch lineage is evaluated three times below (dup-key
    // guard, anti-join key side, union side) — without this, a batch
    // that is itself a pipeline recomputes per evaluation
    val b = batch.persist()
    try {
      // "new version of a key wins" is only well-defined for ONE version
      // per key — a batch carrying two rows for a key would land both
      // (the anti-join removes the old row, the union keeps every batch
      // duplicate), silently corrupting the keyed contract. Fail loudly;
      // resolving versions (e.g. keep max ts per key) is the caller's
      // policy, upstream of the merge. Standard MERGE semantics error on
      // multiple matches for the same reason.
      val dupKeys = b.groupBy(col(key)).count()
        .filter(col("count") > 1).limit(1).count()
      require(dupKeys == 0,
        s"upsertBronze: batch has multiple rows for some '$key' — resolve versions upstream")
      if (!target.exists()) {
        b.write.parquet(path)
      } else {
        val existing = spark.read.parquet(path)
        val merged = existing.join(b.select(col(key)), Seq(key), "left_anti")
          .unionByName(b)
        stageAndSwap(merged, lakeDir, name)
      }
    } finally { b.unpersist(); () }
  }

  /** SCD-2 merge — the version-preserving sibling of [[upsertBronze]]
    * (which is SCD-1: overwrite in place, history lost). The dimension
    * carries `valid_from`/`valid_to` STRING columns (valid_to null =
    * current row); `updates` carries the key plus the current attribute
    * values as of `effectiveTs`. Semantics per key:
    *
    *   - closed history rows pass through untouched
    *   - current row, no update or an update equal on EVERY attribute
    *     (null-safe): passes through — no-op updates create no version
    *   - current row, update differs: the row is CLOSED (valid_to =
    *     effectiveTs) and a new current version opens
    *   - update for a key the dimension lacks: first version opens
    *
    * Shape: ONE shuffle (full-outer join of current rows with the
    * batch on the key — Catalyst broadcasts when the batch is small)
    * and a single projection that conditionally emits 1–2 rows per
    * joined key via explode(array_compact(...)) — the change detection
    * never re-evaluates the join, so there is no repeated-subtree tax
    * to persist away. History rows never join at all. Same loud
    * one-row-per-key batch contract as upsertBronze (standard MERGE
    * semantics error on multiple matches).
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
                effectiveTs: String): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val attrs = dim.columns.filterNot(c =>
      c == key || c == "valid_from" || c == "valid_to").toSeq
    require(dim.columns.contains("valid_from") && dim.columns.contains("valid_to"),
      "scd2Merge: dimension needs valid_from/valid_to validity columns")
    require(dim.schema("valid_from").dataType == StringType &&
      dim.schema("valid_to").dataType == StringType,
      "scd2Merge: validity columns are ISO strings (engine-portable ordering)")
    require(updates.columns.toSet == attrs.toSet + key,
      s"scd2Merge: update batch must carry exactly ($key, ${attrs.mkString(", ")}) " +
        s"— has ${updates.columns.sorted.mkString(", ")}")
    val dupKeys = updates.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0,
      s"scd2Merge: batch has multiple rows for some '$key' — resolve versions upstream")
    val u = updates.select(
      col(key) +: attrs.map(a => col(a).as(s"__u_$a")) :+ lit(true).as("__u_present"): _*)
    val cur = dim.filter(col("valid_to").isNull)
    val hist = dim.filter(col("valid_to").isNotNull)
    val j = cur.join(u, Seq(key), "full_outer")
    val hasCur = col("valid_from").isNotNull
    val hasUpd = coalesce(col("__u_present"), lit(false))
    val same = attrs.map(a => col(a) <=> col(s"__u_$a")).reduce(_ && _)
    val oldRow = struct(
      attrs.map(col) :+ col("valid_from") :+
        when(hasUpd && !same, lit(effectiveTs)).otherwise(col("valid_to")).as("valid_to"): _*)
    val newRow = struct(
      attrs.map(a => col(s"__u_$a").as(a)) :+ lit(effectiveTs).as("valid_from") :+
        lit(null).cast(StringType).as("valid_to"): _*)
    j.select(col(key), explode(array_compact(array(
        when(hasCur, oldRow),
        when(hasUpd && (!hasCur || !same), newRow)))).as("__r"))
      .select(dim.columns.map(c => if (c == key) col(c) else col(s"__r.$c")).toIndexedSeq: _*)
      .unionByName(hist)
  }

  /** Compact a bronze table to `nFiles` output files — the small-file
    * remedy (thousands of tiny parquet files kill scan throughput and
    * NameNode/listing at scale; compaction restores fewer, larger
    * row-groups). Stage-and-swap like upsertBronze. `repartition(n)`
    * round-robins rows evenly; partition/bucket columns would use
    * `repartition(n, cols…)` to preserve clustering.
    */
  def compactBronze(spark: SparkSession, lakeDir: String, name: String,
                    nFiles: Int): Unit =
    stageAndSwap(spark.read.parquet(s"$lakeDir/$name.parquet").repartition(nFiles),
      lakeDir, name)

  /** Write `df` to a staging dir, then swap it in as `{name}.parquet` —
    * the one shared seam for in-place table rewrites. Non-transactional
    * on a plain FS (a reader racing the swap can see a missing dir);
    * a table format (Delta/Iceberg) replaces exactly this method with
    * an atomic commit, nothing else changes.
    */
  private[graft] def stageAndSwap(df: DataFrame, lakeDir: String, name: String,
                                  partitionBy: Seq[String] = Nil): Unit = {
    val path = s"$lakeDir/$name.parquet"
    val tmpPath = s"$lakeDir/$name.parquet.__staging__"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmpPath)
    // lineage sidecar (plans/Lineage), computed from the very frame
    // being staged — BEFORE the old table is deleted, so a rewrite
    // that READS the old artifact (compaction, upsert merge, state
    // absorb) resolves through its existing sidecar and the fresh map
    // IS the carried one (round 13 copied the file; computing subsumes
    // that and also covers frames that merge new rows in). Builders
    // whose plans are checkpoint-truncated overwrite this with their
    // declared map after the swap. writeSidecar degrades to a warning
    // on failure — a committed table must never abort over metadata.
    graft.plans.Lineage.writeSidecar(df, tmpPath)
    def rmTree(f: java.io.File): Unit = {
      // listFiles is null if the dir vanished under us (concurrent
      // cleanup) — treat as already-deleted, not an NPE
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
      f.delete(); ()
    }
    rmTree(new java.io.File(path))
    require(new java.io.File(tmpPath).renameTo(new java.io.File(path)),
      s"staging swap failed for $path")
  }

  /** Delete orphaned `*.parquet.__staging__` dirs under a lake dir — a
    * stageAndSwap that crashed between its staging write and the swap
    * leaves one behind (the swap itself always consumes it). Safe any
    * time NO swap is in flight for the same lake dir: staging dirs are
    * never read, only renamed, so removing an orphan can't affect a
    * reader. Recurses one level into nested namespace dirs (the
    * index/state lakes are `lake/<family>/<corpus>` shaped). Returns
    * the deleted paths so operators can log them.
    */
  def vacuumStaging(lakeDir: String): Seq[String] = {
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
      f.delete(); ()
    }
    def sweep(d: java.io.File, depth: Int): Seq[String] = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      val (orphans, rest) = kids.partition(_.getName.endsWith(".__staging__"))
      orphans.foreach(rmTree)
      orphans.map(_.getPath).toSeq ++
        (if (depth > 0) rest.filter(_.isDirectory).flatMap(sweep(_, depth - 1)) else Nil)
    }
    sweep(new java.io.File(lakeDir), 1)
  }

  /** CSV export with header (app.py:247-248). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Head-N JSON serve (app.py:231): deterministic order, bounded N —
    * the single place a result is allowed to reach the driver.
    */
  def serveJsonHead(df: DataFrame, orderCol: String, n: Int): Seq[String] =
    df.orderBy(col(orderCol)).limit(n).toJSON.collect().toSeq

  /** XML lake edge (built into spark-sql since Spark 4 — the former
    * spark-xml package): one row per `rowTag` element, schema inferred
    * like the JSON edge (or fixed via `schema`, same contract as
    * [[readCsv]]). Files split by element at scan time, so a directory
    * of XML exports parallelizes like any other source.
    */
  def readXml(spark: SparkSession, path: String, rowTag: String,
              schema: Option[String] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).xml(path)
  }

  def writeXml(df: DataFrame, lakeDir: String, name: String, rowTag: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("rowTag", rowTag).option("rootTag", name)
      .xml(s"$lakeDir/$name.xml")

  /** Raw text-lines edge (`spark.read.text`): one row per line with the
    * source path attached — the front door for line-oriented raw corpora
    * (logs, one-doc-per-line dumps) headed into the bronze layer.
    */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(input_file_name().as("path"), col("value").as("line"))

  /** ORC lake edge (built into spark-sql — the columnar sibling of the
    * parquet bronze layer for lakes standardized on ORC).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, lakeDir: String, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(s"$lakeDir/$name.orc")

  /** Excel ingestion, native path (engine.py:25-26, pandas
    * `read_excel`): binaryFile scan + the pure-JVM [[XlsxText]] parser
    * (ZIP + worksheet XML — first sheet, shared/inline strings,
    * booleans; scope documented there). All columns surface as strings
    * (the raw cell texts) — casting is the caller's contract, same as
    * `readCsv` with an explicit schema; date serials and number
    * formats are the documented seam a jar-enabled build closes.
    *
    * Schema discovery reads ONE file's header row on the driver (the
    * lexicographically first file — the same bounded sampling contract
    * csv inference uses); the per-file cell extraction then runs in
    * the executors, parallel by file. With `header`, every file's
    * first row is dropped as its header (a homogeneous directory, the
    * only layout a single schema can describe).
    */
  def readXlsx(spark: SparkSession, path: String, header: Boolean = true): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val firstBytes = bin.orderBy(col("path")).limit(1)
      .select(col("content")).as[Array[Byte]].head()
    val firstRows = XlsxText.extractRows(firstBytes)
    require(firstRows.nonEmpty, s"no worksheet rows found under $path")
    val width = firstRows.head.length
    val names: Seq[String] =
      if (header) {
        val seen = scala.collection.mutable.Map.empty[String, Int]
        firstRows.head.toSeq.zipWithIndex.map { case (raw, i) =>
          val cleaned = raw.trim.replaceAll("[^A-Za-z0-9_]+", "_")
            .replaceAll("^_+|_+$", "")
          val base = if (cleaned.isEmpty) s"_c$i" else cleaned
          val n = seen.getOrElse(base, 0); seen(base) = n + 1
          if (n == 0) base else s"${base}_$n"
        }
      } else (0 until width).map(i => s"_c$i")
    val rows = bin.as[(String, Array[Byte])].flatMap { case (_, bytes) =>
      val rs = XlsxText.extractRows(bytes)
      (if (header) rs.drop(1) else rs)
        .map(r => Array.tabulate(width)(i => if (i < r.length) r(i) else ""))
    }
    rows.select((0 until width).map(i => col("value")(i).as(names(i))): _*)
  }

  /** Excel ingestion, converter seam (SURVEY.md §7.4): convert `.xlsx`
    * → CSV upstream, then `readCsv` — kept for pipelines that already
    * convert at the edge and want csv's type inference; [[readXlsx]]
    * is the native in-engine path.
    */
  def readExcelViaCsv(spark: SparkSession, convertedCsvPath: String): DataFrame =
    readCsv(spark, convertedCsvPath)

  /** PDF ingestion (engine.py:29-33, one row per page): binary front
    * door is `format("binaryFile")`; real text extraction via the
    * pure-JVM [[PdfText]] parser (raw + FlateDecode content streams,
    * Tj/'/"/TJ show operators — scope documented there). Files that
    * don't parse as PDF keep the original deterministic stand-in (one
    * "page" per 1024-char base64 slice) so opaque binaries still
    * exercise the (path, page, content) plumbing. The per-file decode
    * runs in the executors (binary parse, not expressible as Catalyst
    * expressions — same placement rationale as operators/Multimodal);
    * parallelism is by file, like every binaryFile scan.
    */
  def readPdfPages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val pages =
          if (PdfText.looksLikePdf(bytes)) PdfText.extractPages(bytes)
          else PdfText.b64Slices(bytes)
        pages.zipWithIndex.map { case (t, i) => (p, i + 1, t) }
      }
      .toDF("path", "page", "content")
  }

  /** Embedded images of a PDF corpus as multimodal Asset rows
    * (r13 verdict ask #7 + round 15): DCTDecode image streams ARE
    * baseline JPEG and CCITTFaxDecode streams are TIFF G3/G4 strips —
    * the JDK's ImageIO decodes both — so mm featurize/resize/dedup run
    * on REAL rasters extracted from documents, not just synthetic
    * assets. Width/height come from an eager ImageIO decode inside the
    * executor (same per-file placement as the text path); a payload
    * ImageIO rejects still surfaces with 0×0 dims — the multimodal
    * operators' byte-hash fallback handles it, never a silent drop.
    * asset_id = (path-hash << 16) | image ordinal, stable across runs.
    */
  def readPdfImages(spark: SparkSession,
                    path: String): org.apache.spark.sql.Dataset[graft.operators.Multimodal.Asset] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        if (!PdfText.looksLikePdf(bytes)) Seq.empty
        else {
          // JPEG streams surface raw (already an ImageIO format);
          // CCITT fax streams surface PNG-encoded rasters (round 15 —
          // decoded through the JDK TIFF codec). One ordinal space in
          // TRUE document stream order: imageStreams walks the PDF
          // once and dispatches per stream, so mixed JPEG/CCITT PDFs
          // number their images by interleaving position (r15's
          // jpegImages ++ ccittImages concatenation ordered all JPEGs
          // before all CCITTs, and a PDF gaining a CCITT stream
          // renumbered nothing only by luck).
          val payloads = PdfText.imageStreams(bytes)
          payloads.zipWithIndex.map { case (img0, i) =>
            val img =
              try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img0)))
              catch { case _: Exception => None }
            graft.operators.Multimodal.Asset(
              (scala.util.hashing.MurmurHash3.stringHash(p).toLong << 16) | i.toLong,
              "image", img0,
              img.map(_.getWidth).getOrElse(0), img.map(_.getHeight).getOrElse(0), 0L)
          }
        }
      }
  }
}
