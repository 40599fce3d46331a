package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Core._
import graft.functions.VectorExprs

/** Persisted similarity index (reference SearchIndexer lifecycle,
  * engine.py:72-98: build a reusable index ONCE, then serve many
  * queries against it). The in-plan dedup operators (TextOps) recompute
  * signatures per run — right for one-shot batch dedup, wrong for a
  * serving path. Here the MinHash/LSH structures are materialized to
  * the lake as two parquet tables:
  *
  *   sets(sid, ids, tids)   — one row per distinct token set
  *   bands(sid, band, bh)   — 16 LSH band hashes per set (16 bands × 4
  *                            minhash rows; TextOps.bandHashes)
  *
  * and the probe entry answers a query by (1) signing ONLY the 1-row
  * query side, (2) turning its 16 (band, bh) pairs into LITERAL point
  * predicates on the persisted bands table — the probe plan contains a
  * pruned parquet scan of the index and NO corpus-wide signature
  * recompute — and (3) exact Jaccard re-rank of the bucket-bounded
  * candidates via the persisted tids.
  *
  * Scale notes (100 TB): the build is the same one-pass signature
  * pipeline as dedup (bounded by distinct sets); the bands table is
  * written range-partitioned and sorted by (band, bh), so the
  * single-query probe's literal (band, bh) point predicates push into
  * the parquet scan in full and row-group stats skip everything
  * outside the 16 probed buckets — O(row groups hit), independent of
  * index size. `band` is deliberately a DATA column, not a partition
  * dir: every probe touches all 16 bands, so band-dir pruning can
  * never eliminate anything, while dir-partitioning makes Spark bolt a
  * dynamic-partition-pruning subquery onto the batch-join paths (a
  * duplicated probe-side scan for a filter that prunes nothing) and
  * splits the mixed (band, bh) predicate so neither half reaches the
  * scan. On a cluster, registering this same sorted layout with a
  * table format adds file-level min/max skipping on top — the layout
  * already supports it. Batch probes (the incremental entries, the
  * admission gates) keep the equi-join form: their probe side covers
  * many buckets, so a bounded shuffle join is the right shape. Index
  * location is keyed by the source dir, so sf0.01 and sf0.1 never
  * share an index.
  */
object IndexOps {

  /** Lake location of the index for a given source dir. Deliberately
    * NOT under target/: `sbt clean` wiping the serving indexes is how
    * round 6's bench paid cold rebuilds inside probe timings. The lake
    * is build-once/serve-many state, so it lives beside the build
    * products, not among them (still inside the repo so local runs
    * never write outside it; gitignored).
    *
    * `ns` separates independently-grown index NAMESPACES over the same
    * corpus: the oracled batch entries probe the pristine corpus index
    * (ns = ""), while each streaming admission gate grows a private
    * namespace seeded from the corpus — a gate appending admitted docs
    * must never change what the documents-only SQL oracles see.
    */
  private[graft] def indexDir(dir: String, ns: String = ""): String =
    "lake/simindex/" +
      (dir + (if (ns.isEmpty) "" else "@" + ns)).replaceAll("[^A-Za-z0-9.]+", "_")

  /** Signature-logic fingerprints, persisted beside each index and
    * checked on probe. A persisted index encodes the BUILD-TIME
    * signature semantics — if the hash/band config ever changes (new
    * minhash width, different band split, new LSH planes/seed), an index
    * left in target/ by an older code version would silently answer
    * probes with the OLD semantics: wrong/empty candidates, no error.
    * Bump the stamp with any change to signatureTable/bandHashes (sim)
    * or emb/lshBandKeys (vec); ensureIndex then rebuilds instead of
    * serving stale structure.
    */
  private[graft] val simIndexVersion = "sim-v2:xxhash64-tokens;minhash64;bands16x4;lin1"
  private[graft] val vecIndexVersion = "vec-v3:dotp-norm;hyperplane4xW;w-dial-h3c3;probe-h3;lin1"

  /** Cheap SOURCE-DATA identity fingerprint folded into every family's
    * stamp: (file name, length, mtime) of each file under the listed
    * source tables, hashed. Metadata-only — listing a table's files
    * costs milliseconds locally and is a snapshot-id lookup under a
    * real table format; no data scan. Rationale: the round-9 testdata
    * regeneration proved the lake's version-only stamps blind to DATA
    * drift — a regenerated corpus under an unchanged code version would
    * have silently served labels/indexes built from the OLD corpus.
    * With the fingerprint in the stamp, changed source bytes (or even a
    * touch) read as non-current and rebuild through the normal ensure
    * path; unchanged data keeps serving warm.
    */
  private[graft] def dataStamp(dir: String, tables: Seq[String]): String = {
    // Resolved through the Hadoop FileSystem API, NOT java.io.File: a
    // non-local lake URI (hdfs://, s3a://) has no local files, so a
    // java.io walk would silently fingerprint every table as empty and
    // degrade the stamp to version-only — the exact data-drift
    // blindness this fingerprint exists to prevent. A missing table
    // path is shouted (and folded in as "missing", which still differs
    // from any real listing) instead of passing silently.
    val md = java.security.MessageDigest.getInstance("MD5")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    for (t <- tables.sorted) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) {
        System.err.println(
          s"[graft] dataStamp: source table path $p is missing — " +
            "the index fingerprint records it as absent; probes against " +
            "an index of previously-present data will rebuild")
        md.update(s"$t:missing\n".getBytes("UTF-8"))
      } else {
        val it = fs.listFiles(p, true)
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          entries += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
        }
        entries.sorted.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
      }
    }
    new java.math.BigInteger(1, md.digest()).toString(36).take(12)
  }

  /** A family's full stamp: code-semantics version + source-data
    * fingerprint. Every indexCurrent/writeStamp pair goes through a
    * per-family `xxxStamp(dir)` built on this.
    */
  private[graft] def stampFor(codeVersion: String, dir: String, tables: Seq[String]): String =
    codeVersion + "@" + dataStamp(dir, tables)

  private[graft] def simStamp(dir: String): String =
    stampFor(simIndexVersion, dir, Seq("documents"))
  private[graft] def vecStamp(dir: String): String =
    stampFor(vecIndexVersion, dir, Seq("embeddings"))

  private def stampFile(path: String, table: String) =
    new java.io.File(s"$path/$table.version")

  private[queries] def writeStamp(path: String, table: String, v: String): Unit = {
    val f = stampFile(path, table)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, v.getBytes("UTF-8"))
    val ctx = rebuildContext
    // bounded: only the bench ever drains, so a long-lived non-bench
    // JVM (soak tests, REPL, streaming gates) would otherwise grow the
    // journal forever. 4096 >> any real run's rebuild count; overflow
    // drops oldest-first, which a draining bench never reaches
    while (rebuiltTables.size >= 4096) rebuiltTables.poll()
    rebuiltTables.add(s"$table@$path" + (if (ctx.isEmpty) "" else s"#$ctx"))
  }

  /** The bench entry/setup currently executing, stamped onto every
    * journal row as a `#entry` suffix: the unconditional build entries
    * (`*_index_build` overwrites by contract, twice under min-of-two
    * timing) then read as intentional at a glance, while a cold
    * stamp-bump rebuild names the CONSUMER that paid it. bench_diff
    * strips the suffix before its multiset comparison, so tagged and
    * pre-tag artifacts stay comparable.
    */
  @volatile private[graft] var rebuildContext: String = ""

  /** Rebuild journal (r16 verdict ask #6): every stamped-artifact
    * rebuild ends in [[writeStamp]], so this queue records exactly
    * which lake artifacts the current JVM rebuilt. The bench drains it
    * after its setup steps to emit a per-run `rebuilt` list — a fleet
    * run that paid cold rebuilds (stamp bump, fixture regen) is then
    * attributable at a glance, and bench_diff refuses to read its
    * inflated setup/consumer records as plan movers.
    */
  private val rebuiltTables = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private[graft] def drainRebuilds(): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var t = rebuiltTables.poll()
    while (t != null) { out += t; t = rebuiltTables.poll() }
    out.toSeq
  }

  /** Invalidate a family's stamp — the FIRST step of every rebuild
    * path. A rebuild can be triggered while the stamp is still current
    * (e.g. a crashed compaction swap deleted a table's _SUCCESS): if
    * the rebuild then crashes mid-recovery, a stamp left in place would
    * make the half-recovered index read as servable and silently drop
    * admission history. Deleting the stamp up front means the index is
    * non-current from the moment a rebuild starts until tables +
    * recovery + writeStamp all complete.
    */
  private[graft] def clearStamp(path: String, table: String): Unit = {
    stampFile(path, table).delete(); ()
  }

  /** Current stamp content for a family, "" when absent — memo keys
    * that must invalidate on rebuild compare this, never cache it.
    */
  private[graft] def readStamp(path: String, table: String): String = {
    val f = stampFile(path, table)
    if (f.isFile) new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    else ""
  }

  /** Session-memoized SERVED small index tables (IVF centroids, PQ
    * codebook): every probe consumes the same few-hundred-row frame,
    * and re-opening the parquet per query (listing + footer + fresh
    * codegen) costs more than the data — a real ANN server pins these
    * next to the index handle. Keyed by the family's VERSION STAMP
    * CONTENT, so a rebuild (stamp cleared, then rewritten) can never
    * serve stale geometry from the memo: a mismatched stamp drops and
    * re-reads. Released via [[evictServedTables]] (chained from the
    * session-wide TextOps.evictCaches hook).
    */
  private val servedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), (String, DataFrame)]
  private val servedLock = new Object

  private[queries] def servedTable(s: SparkSession, path: String,
                                   table: String, family: String): DataFrame =
    servedLock.synchronized {
      val stamp = readStamp(path, family)
      servedCache.get((s, path, table)) match {
        case Some((st, df)) if st == stamp => df
        case prev =>
          prev.foreach(_._2.unpersist())
          val df = s.read.parquet(s"$path/$table.parquet").persist()
          servedCache.put((s, path, table), (stamp, df))
          df
      }
    }

  private[queries] def evictServedTables(s: SparkSession): Unit =
    servedLock.synchronized {
      servedCache.keys.filter(_._1 eq s).foreach { k =>
        servedCache.remove(k).foreach(_._2.unpersist())
      }
    }

  /** An index table is servable iff its parquet commit marker exists
    * (a crashed build leaves no _SUCCESS) AND its version stamp matches
    * the running code's signature semantics.
    */
  private[graft] def indexCurrent(path: String, tables: Seq[String], stamp: String,
                                  version: String): Boolean = {
    val committed = tables.forall(t =>
      new java.io.File(s"$path/$t.parquet/_SUCCESS").exists())
    val f = stampFile(path, stamp)
    committed && f.exists() &&
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") == version
  }

  /** Build (overwrite) the persisted index for `dir`; returns its path.
    *
    * The data fingerprint is captured BEFORE the build reads the
    * source (every family follows this): if the source changes
    * mid-build, the stamp still describes the data the index was built
    * FROM, so the next currency check reads non-current and rebuilds.
    * Re-computing the stamp after the tables commit would fingerprint
    * the NEW data over an index of the OLD data — exactly the
    * staleness the stamp exists to prevent.
    */
  private[queries] def buildIndex(s: SparkSession, dir: String, ns: String = ""): String = {
    val stamp = simStamp(dir)
    val path = buildIndexUnstamped(s, dir, ns)
    // stamp AFTER both tables commit: a build that dies mid-way leaves a
    // missing stamp and the next ensureIndex rebuilds
    writeStamp(path, "sim", stamp)
    path
  }

  /** [[buildIndex]] WITHOUT the final stamp — the rebuild-with-recovery
    * path: the stamp is INVALIDATED first (see [[clearStamp]] — a
    * rebuild can start while an old stamp is still current), tables
    * land, the caller's recovery (re-appending a gate's admitted
    * history) runs, and only then does [[ensureIndexStatus]] stamp. A
    * crash anywhere before the stamp leaves the index non-current, so
    * the next use rebuilds AND re-recovers instead of serving a
    * corpus-only index that silently forgot its admissions.
    */
  private def buildIndexUnstamped(s: SparkSession, dir: String, ns: String): String = {
    val path = indexDir(dir, ns)
    clearStamp(path, "sim")
    // the session-memoized signature frame: both written tables derive
    // from it, and it is SHARED with the in-plan dedup family — one
    // signature pipeline per session regardless of which consumer runs
    // first or how often the build is re-timed (lifecycle owned by
    // TextOps.evictCaches)
    val sig = TextOps.signatureTableCached(s, dir)
    val sets = sig.select(col("sid"), col("ids"), col("tids"))
    sets.write.mode(SaveMode.Overwrite).parquet(s"$path/sets.parquet")
    // lineage sidecar (r12 verdict ask #9): the signature plan is
    // un-truncated, so the map is computed from the written frame —
    // probes over the persisted tables trace to documents.text
    graft.plans.Lineage.writeSidecar(sets, s"$path/sets.parquet")
    // the probe-serving layout: rows range-partitioned and sorted by
    // (band, bh), so a probe's literal point predicates skip every row
    // group whose [min,max] range misses the probed buckets (see the
    // object doc for why this is a sort, not a partitionBy). File count
    // scales with the range-partition count, never tasks × bands.
    val bands = sig.select(col("sid"), posexplode(col("bands")).as(Seq("band", "bh")))
    bands
      .repartitionByRange(col("band"), col("bh"))
      .sortWithinPartitions(col("band"), col("bh"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$path/bands.parquet")
    graft.plans.Lineage.writeSidecar(bands, s"$path/bands.parquet")
    path
  }

  /** Probe-side guard: build on first use so entry order never matters
    * (the driver iterates `queries` in map order); rebuild when the
    * persisted index predates the running signature logic.
    *
    * A REBUILD re-signs the BASE CORPUS only — it cannot know about docs
    * a streaming gate appended (they live in the gate's lake table, not
    * the corpus). Callers that grow an index (Streams.dedupIngest) must
    * therefore use [[ensureIndexStatus]] with a `recover` hook that
    * re-appends their admitted lake table, or the gate's "no two
    * admitted docs are ≥0.9-similar" invariant silently breaks for docs
    * admitted before the rebuild.
    */
  private def ensureIndex(s: SparkSession, dir: String, ns: String = ""): String =
    ensureIndexStatus(s, dir, ns)._1

  /** [[ensureIndex]] + whether it had to rebuild (version bump, crashed
    * append, first use). On rebuild, `recover(path)` runs AFTER the base
    * tables commit and BEFORE the version stamp is written: a crash
    * inside recovery leaves the index non-current, so the next use
    * rebuilds and retries the recovery instead of treating a
    * half-recovered index as servable (recovery must therefore be
    * idempotent — the gates' history re-append is: duplicate rows are
    * read-time-distincted and compacted at rest).
    */
  private[graft] def ensureIndexStatus(s: SparkSession, dir: String,
                                       ns: String = "",
                                       recover: String => Unit = _ => ()): (String, Boolean) = {
    val path = indexDir(dir, ns)
    // one captured stamp for check AND write (see buildIndex: the
    // fingerprint must predate the source read)
    val stamp = simStamp(dir)
    if (!indexCurrent(path, Seq("sets", "bands"), "sim", stamp)) {
      buildIndexUnstamped(s, dir, ns)
      recover(path)
      writeStamp(path, "sim", stamp)
      (path, true)
    } else (path, false)
  }

  /** Compact an index namespace in place: streaming appends add one
    * small file set per micro-batch (and a replayed append adds
    * byte-identical duplicate rows), so a long-lived gate degrades into
    * the small-file pathology `sink_compact` exists to fix. Rewrites
    * each index table to `nFiles` files via stage-and-swap, dropping
    * exact-duplicate rows (safe: every index row is content-addressed
    * by its columns — a sid's set row and a (sid, band, bh) row are
    * identical across replays, so distinct() changes no probe answer).
    *
    * Only families whose version stamp is CURRENT are touched: a stale
    * family's rows carry old signature semantics and would only be
    * laundered by a rewrite (re-stamping them was the round-6 review's
    * finding — it defeated the staleness machinery entirely), and a
    * family mid-crashed-append has no committed _SUCCESS to trust as a
    * read source. Both rebuild through their ensure* path instead.
    * No re-stamping is needed for the compacted families: stamps live
    * outside the table dirs and stageAndSwap's fresh write carries its
    * own _SUCCESS.
    */
  private[graft] def compactIndex(s: SparkSession, dir: String, ns: String = "",
                                  nFiles: Int = 4): Unit = {
    val path = indexDir(dir, ns)
    val flat = Seq(
      "sim"    -> Seq("sets", "bands"),
      "vec"    -> Seq("vecs", "vec_bands"),
      "labels" -> Seq("labels"))
    val version = Map("sim" -> simStamp(dir), "vec" -> vecStamp(dir),
      "labels" -> TextOps.labelsStamp(dir))
    // the band tables carry the probe-serving layout ((band, bucket)-
    // sorted row groups) — their rewrite must preserve it, like the
    // IVF cells rewrite below; the flat tables round-robin to nFiles
    val sortKey = Map("bands" -> "bh", "vec_bands" -> "bk")
    for {
      (stamp, tables) <- flat
      if indexCurrent(path, tables, stamp, version(stamp))
      t <- tables
    } graft.sources.Ingest.stageAndSwap(
        sortKey.get(t) match {
          case Some(k) =>
            s.read.parquet(s"$path/$t.parquet").distinct()
              .repartitionByRange(nFiles, col("band"), col(k))
              .sortWithinPartitions(col("band"), col(k))
          case None =>
            s.read.parquet(s"$path/$t.parquet").distinct().repartition(nFiles)
        }, path, t)
    // the IVF cells table is CELL-PARTITIONED (one dir per c_id) and
    // appendToIvfIndex adds one file per touched cell per batch — the
    // same small-file growth, but compaction must preserve the layout:
    // repartition ON the cell key and rewrite partitionBy(c_id), back
    // to one file per cell. Centroids are overwrite-only (never grown).
    if (indexCurrent(path, Seq("ivf_centroids", "ivf_cells"), "ivf",
        IvfIndex.ivfStamp(dir)))
      graft.sources.Ingest.stageAndSwap(
        s.read.parquet(s"$path/ivf_cells.parquet").distinct()
          .repartition(col("c_id")),
        path, "ivf_cells", partitionBy = Seq("c_id"))
    // the PQ code tables grow by append like the cells: flat codes
    // round-robin to nFiles; the composed table preserves its cell
    // partitioning. Codebook/centroids are overwrite-only (never grown).
    if (indexCurrent(path, Seq("pq_codebook", "pq_codes"), "pq",
        PqIndex.pqStamp(dir)))
      graft.sources.Ingest.stageAndSwap(
        s.read.parquet(s"$path/pq_codes.parquet").distinct().repartition(nFiles),
        path, "pq_codes")
    if (indexCurrent(path, Seq("ivfpq_codes"), "ivfpq", PqIndex.ivfPqStamp(dir)))
      graft.sources.Ingest.stageAndSwap(
        s.read.parquet(s"$path/ivfpq_codes.parquet").distinct()
          .repartition(col("c_id")),
        path, "ivfpq_codes", partitionBy = Seq("c_id"))
  }

  /** Ensure every persisted index family for `dir` is built and
    * current — the bench's third named setup step. A cold lake (fresh
    * checkout, first run after a version bump) pays its index builds
    * HERE, attributed to one named line, instead of inside whichever
    * probe entry happens to run first — probe timings are then always
    * the warm serving marginal they claim to be.
    */
  /** Each index/state family as its own named warm step so the bench can
    * attribute (and fail) them independently — in round 9 one broken
    * ensure (HLL, via the events encoding change) zeroed the whole
    * chain's attribution as a single -1.0 line, hiding that the other
    * six had succeeded.
    */
  private[graft] val warmSteps: Seq[(String, (SparkSession, String) => Unit)] =
    Seq[(String, (SparkSession, String) => Unit)](
      "setup_sim_index"   -> ((s, d) => { ensureIndex(s, d); () }),
      "setup_vec_index"   -> ((s, d) => { ensureVecIndex(s, d); () }),
      "setup_ivf_index"   -> ((s, d) => { IvfIndex.ensureIvfIndex(s, d); () }),
      "setup_pq_index"    -> ((s, d) => { PqIndex.ensurePqIndex(s, d); () }),
      "setup_ivfpq_index" -> ((s, d) => { PqIndex.ensureIvfPqIndex(s, d); () }),
      // the incremental-aggregate state artifacts serve the same
      // build-once-serve-many contract as the indexes
      "setup_mix_state"   -> ((s, d) => { PipelineOps.ensureMixState(s, d); () }),
      "setup_hll_state"   -> ((s, d) => { PipelineOps.ensureHllState(s, d); () }),
      "setup_lm_state"    -> ((s, d) => { PipelineOps.ensureLmState(s, d); () }),
      // the frozen-encoder word-vector model (EmbedOps) is a lake
      // artifact on the same build-once-serve-many contract
      "setup_embed_model" -> ((s, d) => { EmbedOps.ensureEmbedModel(s, d); () }),
      // cosine-dedup cluster labels (EmbedOps) — quadratic pair build
      // owned here as a named cold cost, entries serve the artifact
      "setup_embed_dedup" -> ((s, d) => { EmbedOps.ensureEmbDedup(s, d); () }),
      // bucketed fact projections (FactLayout) — the lake-layout write
      // that removes the q21/q2/weighted-median fact exchanges; named
      // here so a cold lake pays the bucketed shuffle+write as its own
      // line, never inside a consumer's timing
      "setup_fact_layout" -> ((s, d) => { FactLayout.ensure(s, d); () }))

  private[graft] def warmPersistedIndexes(s: SparkSession, dir: String): Unit =
    warmSteps.foreach { case (_, f) => f(s, dir) }

  /** Absolute lake-artifact base for the fixture being verified — the
    * persisted-artifact oracle device (mm_image_dedup, round 12):
    * index-family oracles resolve their read_parquet paths against THIS
    * directory at class-init time, independent of the DuckDB process's
    * CWD. The base follows [[graft.OracleEnv]] (Verify binds it to its
    * sfDir argument before first touch; default = the driver's sf0.01
    * gate fixture), so verifying any fixture compares against that
    * fixture's own artifacts. Verify runs the entry first, which
    * builds/refreshes the artifact the oracle then reads back.
    */
  private[graft] val oracleArtifactBase: String =
    new java.io.File(indexDir(graft.OracleEnv.sfDir)).getAbsolutePath

  val entries: Seq[Entry] = Seq(

    // PROMOTED r13 (persisted-artifact replay, verdict r12 ask #7): the
    // declared output is summary stats over tables DuckDB reads back
    // via absolute-path read_parquet; sum(len(ids)) casts to BIGINT so
    // DuckDB's HUGEINT sum lands as the same integer Spark's sum(long)
    // does.
    entry(
      "sim_index_build",
      s"""WITH bands AS (SELECT band, bh
         |    FROM read_parquet('$oracleArtifactBase/bands.parquet/*.parquet')),
         |sets AS (SELECT count(*) AS n_sets, CAST(sum(len(ids)) AS BIGINT) AS n_docs
         |  FROM read_parquet('$oracleArtifactBase/sets.parquet/*.parquet'))
         |SELECT band, count(*) AS n_sigs, count(DISTINCT bh) AS n_buckets, n_sets, n_docs
         |FROM bands, sets GROUP BY band, n_sets, n_docs ORDER BY band""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val path = buildIndex(s, dir)
      // Declared output = deterministic stats OF THE PERSISTED TABLES
      // (read back, not recomputed): proves the index landed on disk.
      val bands = s.read.parquet(s"$path/bands.parquet")
      val sets  = s.read.parquet(s"$path/sets.parquet")
      bands.groupBy($"band")
        .agg(count(lit(1)).as("n_sigs"), countDistinct($"bh").as("n_buckets"))
        .crossJoin(broadcast(sets.agg(
          count(lit(1)).as("n_sets"),
          sum(size($"ids")).as("n_docs"))))
        .orderBy($"band")
    },

    // Oracled (r4 #7): the oracle is the EXACT all-pairs Jaccard of doc 0
    // against the corpus — promotion is sound because banding recall was
    // verified total on both gate fixtures (sf0.001 finds a genuine
    // 0.9412 partner through the bands; sf0.01 the self-match). With the
    // shipped 16 bands × 4 rows (TextOps.bandHashes), per-pair recall at
    // j=0.9 is 1−(1−0.9⁴)¹⁶ ≈ 1−4·10⁻⁸ — effectively total, which is
    // WHY the oracle promotion is sound. Still: REGENERATED data could
    // in principle plant a pair the bands miss — if the fixtures ever
    // change, re-verify before trusting a hash mismatch as a code bug.
    entry(
      "sim_index_probe",
      """WITH t AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS toks
        |  FROM documents),
        |q AS (SELECT toks AS qt FROM t WHERE doc_id = 0),
        |j AS (SELECT doc_id,
        |    len(list_intersect(toks, qt)) * 1.0 /
        |    (len(toks) + len(qt) - len(list_intersect(toks, qt))) AS jac
        |  FROM t, q WHERE len(toks) > 0)
        |SELECT doc_id, round(jac, 4) AS jaccard FROM j
        |WHERE jac >= 0.9 ORDER BY jaccard DESC, doc_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      VectorExprs.register(s)
      val path = ensureIndex(s, dir)
      // Sign the 1-row query CLIENT-SIDE (a bounded 1-row collect — the
      // serving shape: a query's signature is computed by the client,
      // like the reference computing the query embedding before asking
      // the index, engine.py:95-98). The payoff is the scan below: the
      // 16 (band, bh) pairs become LITERAL point predicates, so the
      // band-partitioned, bh-sorted index scan prunes to 16 dirs and
      // row-group-skips inside them — a join form cannot push these and
      // would scan the whole bands table at every probe.
      val qrows = load(s, dir, "documents")
        .filter($"doc_id" === 0)
        .select(array_sort(transform(array_distinct(tokens(lower($"text"))),
          t => xxhash64(t))).as("qtids"))
        // a token-less query doc has no signature and jaccard 0/0 —
        // declared empty, mirroring the incremental entry's guard
        .filter(size($"qtids") > 0)
        .select($"qtids",
          TextOps.bandHashes(call_function("minhash64", $"qtids")).as("bands"))
        .collect()
      if (qrows.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("jaccard",
              org.apache.spark.sql.types.DoubleType))))
      else {
        val qtids = qrows.head.getSeq[Long](0)
        val qbands = qrows.head.getSeq[Long](1)
        // one OR-of-16 point predicate over two DATA columns — pushed
        // into the parquet scan in full, where (band, bh)-sorted row
        // groups stat-skip everything outside the 16 probed buckets:
        // the probe reads O(row groups hit), not O(index)
        val probePred = qbands.zipWithIndex
          .map { case (h, b) => $"band" === b && $"bh" === h }
          .reduce(_ || _)
        val cand = s.read.parquet(s"$path/bands.parquet")
          .filter(probePred)
          // skinny distinct: sid only — replay-duplicated band rows and
          // multi-band collisions collapse before the sets join
          .select($"sid").distinct()
        val sets = s.read.parquet(s"$path/sets.parquet")
        val qt = typedlit(qtids)
        val inter = call_function("sorted_long_intersect_size", $"tids", qt).cast("double")
        val jac   = inter / (size($"tids") + lit(qtids.length) - inter)
        cand.join(sets, "sid")
          .filter(jac >= 0.9)
          .select(explode($"ids").as("doc_id"), round(jac, 4).as("jaccard"))
          // a replay-duplicated index row (k copies of a sid in
          // sets.parquet) would otherwise multiply its matches k× — the
          // duplicates are byte-identical and each doc_id belongs to
          // exactly one set, so distinct() restores exactly-once rows
          .distinct()
          .orderBy($"jaccard".desc, $"doc_id")
      }
    },

    // ORACLED (round 5): exact batch-vs-corpus Jaccard pairs — sound for
    // the same reason as text_dedup_near (16×4 banding recall is
    // effectively total; verified pairwise on both gate fixtures).
    entry(
      "sim_index_incremental",
      """WITH t AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS toks
        |  FROM documents),
        |tt AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |n AS (SELECT doc_id, count(*) AS nt FROM tt GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM tt a JOIN tt b ON a.term = b.term AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2, round(inter*1.0/(na.nt+nb.nt-inter), 4) AS jac
        |  FROM p JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2
        |  WHERE inter*1.0/(na.nt+nb.nt-inter) >= 0.9)
        |SELECT b_doc, match_doc, jac AS jaccard FROM (
        |  SELECT d1 AS b_doc, d2 AS match_doc, jac FROM pairs WHERE d1 % 10 = 7
        |  UNION ALL
        |  SELECT d2, d1, jac FROM pairs WHERE d2 % 10 = 7)
        |ORDER BY b_doc, match_doc""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Incremental dedup — the production daily-ingest shape: sign ONLY
      // the new batch (here: doc_id % 10 == 7 — a codegen'd filter over
      // the scan; pmod is not a parquet-pushable predicate, and in
      // production the batch is its own table, for which the split
      // stands in), probe the persisted index, emit (batch doc → indexed
      // near-dup) pairs. Corpus signatures are never recomputed; cost
      // scales with the batch, not the lake. Shares signDocs/probeMatches
      // with the streaming admission gate so the two can never disagree
      // about what counts as a duplicate.
      val path = ensureIndex(s, dir)
      val signed = signDocs(s,
        load(s, dir, "documents").filter(pmod($"doc_id", lit(10)) === 7))
      probeMatches(s, path, signed)
        .select($"b_doc", explode($"ids").as("match_doc"), $"jaccard")
        .filter($"match_doc" =!= $"b_doc")
        .orderBy($"b_doc", $"match_doc")
    },

    // ---- Persisted VECTOR index (the reference's Chroma collection is
    // ---- a vector store — engine.py:74-93 — so this is the closest
    // ---- structural analogue: embed-and-index once, probe many).

    entry(
      "vec_index_build",
      s"""WITH ${VecOps.vecIndexBandsCteSql},
         |n AS (SELECT count(*) AS n_vecs FROM embeddings)
         |SELECT band, count(*) AS n_sigs, count(DISTINCT bk) AS n_buckets, n_vecs
         |FROM bands, n GROUP BY band, n_vecs ORDER BY band""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // HARD-ORACLED (round 12, literal-planes device — see
      // VecOps.vecIndexBandsCteSql): the declared per-band summary of the
      // PERSISTED tables is replayed by DuckDB recomputing every
      // signature from the literal ±1 plane matrix, so a signing or
      // layout drift in the stored index hash-mismatches.
      val path = buildVecIndex(s, dir)
      val bands = s.read.parquet(s"$path/vec_bands.parquet")
      val vecs  = s.read.parquet(s"$path/vecs.parquet")
      bands.groupBy($"band")
        .agg(count(lit(1)).as("n_sigs"), countDistinct($"bk").as("n_buckets"))
        .crossJoin(broadcast(vecs.agg(count(lit(1)).as("n_vecs"))))
        .orderBy($"band")
    },

    entry(
      "vec_index_probe",
      s"""WITH ${VecOps.vecIndexBandsCteSql},
         |q AS (SELECT band, bk FROM bands WHERE vec_id = 0),
         |qv AS (SELECT embedding::DOUBLE[] AS qemb,
         |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qnorm
         |  FROM embeddings WHERE vec_id = 0),
         |cand AS (SELECT DISTINCT y.vec_id FROM q JOIN bands y
         |  ON y.band = q.band AND bit_count(xor(y.bk, q.bk)) <= 3 AND y.vec_id <> 0)
         |SELECT c.vec_id,
         |  round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qemb), 6) AS score
         |FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN qv
         |WHERE qv.qnorm > 0
         |ORDER BY score DESC, c.vec_id LIMIT 5""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      VectorExprs.register(s)
      val path = ensureVecIndex(s, dir)
      // the artifact's FROZEN width — probes must sign exactly like the
      // build did (r14 verdict ask #1), so w comes from the vec_w file,
      // never re-derived from the (possibly grown) corpus
      val w = readVecW(path)
      // Sign the 1-row query CLIENT-SIDE (bounded 1-row collect — the
      // sim_index_probe pattern): the Hamming-≤3 multi-probe ring is
      // expanded driver-side into 4 × (1+w+C(w,2)+C(w,3)) literal
      // bucket keys (697 at w=16), pushed as band-dir pruning + an
      // In(bk, …) filter on the bk-sorted index. The stored index keeps
      // one row per (vector, band); a join form would scan all of it
      // per probe.
      val qrows = load(s, dir, "embeddings")
        .filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>").as("qemb"))
        .withColumn("qnorm", sqrt(call_function("dotp", $"qemb", $"qemb")))
        // a zero-norm query (cosine undefined) must yield an empty
        // result, not NaN scores that sort above every real neighbor
        .filter($"qnorm" > 0)
        .withColumn("bands", VecOps.lshBandKeysW($"qemb", w))
        .collect()
      if (qrows.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("score",
              org.apache.spark.sql.types.DoubleType))))
      else {
        val qemb  = qrows.head.getSeq[Double](0)
        val qnorm = qrows.head.getDouble(1)
        val qkeys = qrows.head.getSeq[Long](2)
        // NOTE the serving session should set
        // spark.sql.parquet.pushdown.inFilterThreshold=1024 (Bench/
        // Verify/test sessions do, at build time): the default (10)
        // rewrites the ring's In-sets into near-vacuous [min,max]
        // range checks before they reach the row-group filter. 1024 is
        // also a CEILING: below the threshold Spark expands the In to
        // an OR-chain of parquet eq's whose RECURSIVE evaluation is
        // one stack frame per key — a dialed w=26 ring (2,952 keys per
        // band) overflows the executor stack (StackOverflowError,
        // measured at the 25× fixture when this was briefly raised to
        // 4096). So In-pushdown covers rings up to w=18 (988 keys);
        // wider dialed artifacts deliberately degrade to the range
        // fallback, where the probe is a 24-byte-row band-table scan +
        // residual filter — and true lake-scale single-query ANN
        // serving is the IVF/PQ family (partition-pruned), per the
        // documented contract. Not set HERE: a query entry mutating
        // session conf would make every other query's pushdown
        // behavior depend on whether this entry ran first. Correctness
        // is unaffected either way — only row-group skipping changes.
        // OR-of-4 band predicates, each carrying its Hamming-≤3 ring as
        // a literal In(bk, ring keys) — all data columns, pushed whole
        // (see sim_index_probe / the object doc for the layout story)
        val probePred = qkeys.zipWithIndex.map { case (k, b) =>
          $"band" === b &&
            $"bk".isInCollection(VecOps.probeMasksWideW(w).map(_ ^ k))
        }.reduce(_ || _)
        val cand = s.read.parquet(s"$path/vec_bands.parquet")
          .filter(probePred)
          .filter($"vec_id" =!= 0)
          .select($"vec_id").distinct()
        val qe = typedlit(qemb)
        cand.join(s.read.parquet(s"$path/vecs.parquet"), "vec_id")
          .select($"vec_id",
            round(call_function("dotp", $"emb", qe) / ($"norm" * qnorm), 6).as("score"))
          .orderBy($"score".desc, $"vec_id")
          .limit(5)
      }
    },

    entry(
      "vec_index_incremental",
      s"""WITH ${VecOps.vecIndexBandsCteSql},
         |batch AS (SELECT vec_id AS b_id, embedding::DOUBLE[] AS b_emb FROM embeddings
         |  WHERE vec_id % 10 = 7
         |    AND sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0),
         |qb AS (SELECT b.b_id, s.band, s.bk FROM batch b JOIN bands s ON s.vec_id = b.b_id),
         |cand AS (SELECT DISTINCT qb.b_id, y.vec_id FROM qb JOIN bands y
         |  ON y.band = qb.band AND bit_count(xor(y.bk, qb.bk)) <= 3
         |    AND y.vec_id <> qb.b_id),
         |sc AS (SELECT c.b_id, c.vec_id,
         |    round(list_cosine_similarity(e.embedding::DOUBLE[], b.b_emb), 6) AS score
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN batch b ON b.b_id = c.b_id),
         |rk AS (SELECT b_id, vec_id, score,
         |    row_number() OVER (PARTITION BY b_id ORDER BY score DESC, vec_id) AS rnk
         |  FROM sc)
         |SELECT b_id, rnk, vec_id, score FROM rk WHERE rnk <= 3
         |ORDER BY b_id, rnk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      VectorExprs.register(s)
      // HARD-ORACLED (round 12, literal-planes device): DuckDB replays
      // batch signing, the Hamming-≤3 ring (as bit_count(xor) ≤ 3 —
      // equivalent to the stored probeKeysWide mask expansion), and the
      // 6dp cosine row_number ranking.
      val path = ensureVecIndex(s, dir)
      // batch signing at the artifact's FROZEN width (see
      // vec_index_probe) — the cure for the r14-documented cliff where
      // a frozen w=16 pulled ~17% of a 50k corpus into each batch
      // vector's Hamming-≤3 ring: the BUILD now widens w with corpus
      // size, and this path follows the stored width
      val w = readVecW(path)
      // Incremental ANN lookup for a NEW embedding batch (vec_id % 10
      // == 7 stands in for today's ingest): sign only the batch, band-
      // join the persisted index, exact-cosine top-3 per batch vector.
      // Corpus signatures come from the lake; cost scales with the
      // batch. The near-duplicate filter a training pipeline runs
      // before adding embeddings to the store.
      val batch = load(s, dir, "embeddings")
        .filter(pmod($"vec_id", lit(10)) === 7)
        .select($"vec_id".as("b_id"), $"embedding".cast("array<double>").as("b_emb"))
        .withColumn("b_n", sqrt(call_function("dotp", $"b_emb", $"b_emb")))
        // zero-norm batch vectors have no defined cosine: excluded from
        // the declared output (NaN scores would rank FIRST under desc),
        // matching the novelVectors/append zero-norm contract
        .filter($"b_n" > 0)
        .withColumn("bands", VecOps.lshBandKeysW($"b_emb", w))
        // the batch feeds the probe explosion AND the post-candidate
        // embedding join-back — localCheckpoint so the corpus table is
        // scanned once for the batch read (the ingest batch is the
        // bounded side by contract)
        .localCheckpoint()
      // wide (Hamming-≤3) multi-probe on the batch (query) side: ×697
      // narrow key rows, joined against the one-row-per-(vector, band)
      // persisted index — the batch is the bounded side, so the extra
      // Hamming ring costs key rows, not candidate blowup. The probe
      // rows carry IDS ONLY: riding b_emb through the ×2,788 explosion
      // shipped a 64-double array on every probe row (measured 2.4 GB
      // of exchange at the 25× fixture, where the stand-in batch is
      // corpus-proportional) — the batch embeddings re-join AFTER the
      // candidate distinct, on the |candidates|-sized stream.
      val qb = batch.select($"b_id", posexplode($"bands").as(Seq("band", "bk")))
        .select($"b_id", $"band", explode(VecOps.probeKeysWideW($"bk", w)).as("bk"))
      val cand = s.read.parquet(s"$path/vec_bands.parquet")
        .join(qb, Seq("band", "bk"))
        .filter($"vec_id" =!= $"b_id")
        .select($"b_id", $"vec_id").distinct()
        // localCheckpoint so the size guard's count below reuses the
        // materialized candidate set instead of re-running the band join
        .localCheckpoint()
      import org.apache.spark.sql.expressions.Window
      val wRank = Window.partitionBy($"b_id").orderBy($"score".desc, $"vec_id")
      // Embedding fetch WITHOUT shuffling the corpus (r15): cand is the
      // BROADCAST side of the vecs join, so the stored embedding table
      // streams map-side — at lake scale an SMJ here would re-shuffle
      // the whole corpus (embeddings included) once per ingest batch
      // (measured 67 MB of exchange even at the 25× fixture, where the
      // left side carried a 64-double b_emb per candidate row into the
      // corpus join). cand is bounded by |batch| × the width dial's
      // ring budget (~3 random collisions per band × 4 bands + true
      // neighbors — VecWidthDiag measured ~18-25/vector at every
      // fixture), and the batch is admission-bounded by contract, so
      // both broadcasts are id/score-slim. That bound only covers
      // RANDOM collisions, though — a duplicate-heavy batch against a
      // dense corpus cluster makes candidates scale with
      // |batch|×|cluster| — so BOTH hints are size-guarded
      // (Core.guardedBroadcast): the counts are cheap (both frames are
      // localCheckpointed), and above the dial the hint drops and the
      // fetch degrades to a shuffle join instead of a driver OOM. The
      // b_emb arrays ride the SECOND broadcast (batch-sized), never an
      // exchange; the only shuffles left are the candidate distinct
      // and the b_id-partitioned rank window over (b_id, vec_id,
      // score) rows.
      // byte bounds derived from each frame's actual schema
      // (Core.broadcastStats — id-pair rows fixed-width, the b_emb
      // array measured; r16 ADVICE retired the 32 B/600 B literals)
      val bSel = batch.select($"b_id", $"b_emb", $"b_n")
      val candStats = graft.Core.broadcastStats(cand)
      val batchStats = graft.Core.broadcastStats(bSel)
      s.read.parquet(s"$path/vecs.parquet")
        .join(graft.Core.guardedBroadcast(s, cand)(candStats), "vec_id")
        .join(graft.Core.guardedBroadcast(s, bSel)(batchStats), "b_id")
        .select($"b_id", $"vec_id",
          round(call_function("dotp", $"emb", $"b_emb") / ($"norm" * $"b_n"), 6).as("score"))
        .withColumn("rnk", row_number().over(wRank))
        .filter($"rnk" <= 3)
        .select($"b_id", $"rnk", $"vec_id", $"score")
        .orderBy($"b_id", $"rnk")
    }
  )

  /** Sign a (doc_id, text, …) frame with the shared token-set signature:
    * (b_doc, btids, bands). Token-less docs drop out (no signature — and
    * downstream they pass any novelty gate as trivially novel).
    */
  private def signDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    VectorExprs.register(s)
    docs.select(col("doc_id").as("b_doc"),
        array_sort(transform(array_distinct(graft.Core.tokens(lower(col("text")))),
          t => xxhash64(t))).as("btids"))
      .filter(size(col("btids")) > 0)
      .withColumn("bands", TextOps.bandHashes(call_function("minhash64", col("btids"))))
  }

  /** Probe the persisted index with a signed batch: verified matches
    * (b_doc, sid, ids, jaccard) at ≥ 0.9 — ONE definition of "duplicate
    * of the indexed corpus", shared by the batch entry and the streaming
    * admission gate so the two can never drift.
    */
  private def probeMatches(s: SparkSession, path: String, signed: DataFrame): DataFrame = {
    val qb = signed.select(col("b_doc"), col("btids"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    // NO distinct between the band join and the verify: a pair that
    // collides in k bands flows through k times and computes its exact
    // jaccard k times. That redundant compute is map-side and cheap
    // (both join sides here are broadcast-sized); deduping the pairs
    // FIRST — the previous shape — forced a shuffle of every candidate
    // row still carrying its ~100-long btids signature array (measured
    // 1.4M fat rows ≈ 1 GB shuffled at sf0.1, 3× the whole query's
    // runtime). Verify-then-dedup shuffles only the matched skinny rows.
    val cand = s.read.parquet(s"$path/bands.parquet")
      .join(qb, Seq("band", "bh"))
      .select(col("b_doc"), col("btids"), col("sid"))
    val sets = s.read.parquet(s"$path/sets.parquet")
    // The ≥0.9 test runs per CANDIDATE (millions of band-collision rows;
    // the intersect walks two ~100-long arrays), so it is written to
    // evaluate the intersect expression ONCE and only when it can
    // matter:
    //  - size guard first: jac ≥ 0.9 needs 19·min(|A|,|B|) ≥ 9·(|A|+|B|)
    //    (best case inter = min); O(1), short-circuits the array walk
    //    for size-incompatible pairs;
    //  - integer form of the threshold: inter/(|A|+|B|−inter) ≥ 0.9 ⟺
    //    19·inter ≥ 9·(|A|+|B|) — a single intersect reference, where
    //    the double-division form cost 2 evaluations in the join
    //    condition plus 2 more in the jaccard projection;
    //  - the reported jaccard is then computed for SURVIVORS only.
    val a = size(col("tids")); val b = size(col("btids"))
    val inter = call_function("sorted_long_intersect_size", col("tids"), col("btids"))
    val sizeOk  = lit(19) * least(a, b) >= lit(9) * (a + b)
    val interOk = lit(19) * inter >= lit(9) * (a + b)
    val jac = inter.cast("double") / (a + b - inter)
    // dedup on the three SKINNY columns only — the `ids` family array
    // (hundreds of doc ids for a big duplicate family) must not ride
    // through the distinct's shuffle; it is re-attached afterwards from
    // the same small sets table (an index read, not a corpus read).
    // The distinct collapses k-band collision copies AND replayed-append
    // duplicate set rows (compaction removes those at rest; this guards
    // the window before it runs); the .distinct() on the ids projection
    // keeps replayed duplicates from re-multiplying at the re-attach.
    val verified = cand.join(sets.select(col("sid"), col("tids")), "sid")
      .filter(sizeOk && interOk)
      .select(col("b_doc"), col("sid"), round(jac, 4).as("jaccard"))
      .distinct()
    verified.join(sets.select(col("sid"), col("ids")).distinct(), "sid")
      .select(col("b_doc"), col("sid"), col("ids"), col("jaccard"))
  }

  /** Batch-mode novelty filter against the persisted index AND within
    * the batch itself: the subset of `batch` (doc_id, text, …) that a
    * streaming ingest should ADMIT (Streams.dedupIngest drives this per
    * micro-batch, then grows the index with what it admitted):
    *
    *  - vs the INDEX: docs with a ≥0.9 match among indexed sets are
    *    dropped — except self-matches (`ids` containing the doc's own
    *    id), so a REPLAYED batch whose docs were already appended to
    *    the index re-admits identically instead of rejecting itself
    *    (the idempotence foreachBatch's at-least-once delivery needs);
    *  - WITHIN the batch: a doc with a ≥0.9 partner of smaller doc_id
    *    in the same batch is dropped (covers exact copies, jaccard 1).
    *    Greedy, not transitive: over chains A~B~C it can drop C even
    *    though its kept partner was itself dropped — over-rejection is
    *    the safe direction for an admission gate, and no two ADMITTED
    *    docs are ever ≥0.9-similar.
    */
  private[graft] def novelDocs(s: SparkSession, dir: String,
                               batch: DataFrame, ns: String = ""): DataFrame = {
    val path = ensureIndex(s, dir, ns)
    val signed = signDocs(s, batch)
    val dupVsIndex = probeMatches(s, path, signed)
      .filter(!array_contains(col("ids"), col("b_doc")))
      .select(col("b_doc").as("doc_id")).distinct()
    val sb = signed.select(col("b_doc"), col("btids"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    // single-evaluation integer threshold + size guard, the probeMatches
    // rewrite (19·inter ≥ 9·(|A|+|B|) ⟺ jac ≥ 0.9); verify-then-dedup:
    // k-band collisions re-verify k times map-side rather than shuffling
    // signature-carrying pair rows just to dedup candidates
    val wa = size(col("btids")); val wb = size(col("otids"))
    val winter = call_function("sorted_long_intersect_size",
      col("btids"), col("otids"))
    val dupInBatch = sb.as("x").join(sb.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.b_doc") > col("y.b_doc"))
      .select(col("x.b_doc").as("b_doc"), col("x.btids").as("btids"),
        col("y.btids").as("otids"))
      .filter(lit(19) * least(wa, wb) >= lit(9) * (wa + wb) &&
              lit(19) * winter >= lit(9) * (wa + wb))
      .select(col("b_doc").as("doc_id")).distinct()
    batch.join(dupVsIndex.unionByName(dupInBatch), Seq("doc_id"), "left_anti")
  }

  /** Grow the persisted index with newly admitted docs (each its own
    * 1-doc set) — the streaming gate calls this after admission so the
    * NEXT batch sees this batch's documents. Parquet append; replayed
    * appends add byte-identical duplicate rows, which probeMatches
    * dedups at read time and [[compactIndex]] removes at rest.
    */
  private[graft] def appendToIndex(s: SparkSession, dir: String,
                                   admitted: DataFrame, ns: String = ""): Unit = {
    appendToIndexAt(s, ensureIndex(s, dir, ns), admitted)
    maybeCompact(s, dir, ns, "bands")
  }

  /** Small-file backstop OWNED BY THE APPEND PATH: the streaming gates
    * compact on an every-8-batches cadence, but direct batch callers of
    * the append APIs have no cadence owner — without one, N appends
    * leave N× small files and probe scans degrade linearly with append
    * count. Each dir-based append therefore checks its fattest table's
    * part-file count after committing and compacts the namespace when
    * the count exceeds `baseline` (the table's COMPACTED file count —
    * 64 cell files for ivf_cells, nFiles for the flat tables; comparing
    * against zero would re-trigger on every append forever once the
    * compacted size itself reaches the threshold) by more than the
    * threshold (conf `spark.graft.index.compactFiles`, default 64 —
    * amortized: one rewrite per ~threshold appends). The *At variants
    * stay raw by design: they are the recovery-hook form, and
    * compaction during recovery would see a cleared stamp and no-op
    * anyway. Local-FS listing here mirrors the stamp machinery; a
    * cluster deployment swaps both seams to Hadoop FileSystem calls.
    */
  private[queries] def maybeCompact(s: SparkSession, dir: String, ns: String,
                                    table: String, baseline: Int = 4): Unit = {
    val threshold = s.conf.get("spark.graft.index.compactFiles", "64").trim.toIntOption
      .filter(_ > 0).getOrElse(64)
    if (tableFileCount(indexDir(dir, ns), table) > baseline + threshold)
      compactIndex(s, dir, ns)
  }

  private[graft] def tableFileCount(path: String, table: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.iterator.map(walk).sum).getOrElse(0)
      else if (f.getName.startsWith("part-")) 1 else 0
    walk(new java.io.File(s"$path/$table.parquet"))
  }

  /** Append to an index at a KNOWN path, no ensure — the form a rebuild
    * recovery hook must use ([[ensureIndexStatus]] invokes the hook
    * before the stamp lands, so an ensure here would recurse into
    * another rebuild).
    */
  private[graft] def appendToIndexAt(s: SparkSession, path: String,
                                     admitted: DataFrame): Unit = {
    val signed = signDocs(s, admitted)
    signed.select(col("b_doc").as("sid"), array(col("b_doc")).as("ids"),
        col("btids").as("tids"))
      .write.mode(SaveMode.Append).parquet(s"$path/sets.parquet")
    // appends add small unsorted files; a probe's pushed predicates
    // still evaluate against their row-group stats (just with weaker
    // skipping on the fresh tail) until compaction re-sorts them
    signed.select(col("b_doc").as("sid"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      .write.mode(SaveMode.Append).parquet(s"$path/bands.parquet")
  }

  /** Build (overwrite) the persisted vector index for `dir` (stamp
    * captured pre-read — see [[buildIndex]]).
    */
  private[graft] def buildVecIndex(s: SparkSession, dir: String, ns: String = ""): String = {
    val stamp = vecStamp(dir)
    val path = buildVecIndexUnstamped(s, dir, ns)
    writeStamp(path, "vec", stamp)
    path
  }

  /** Tables-only build — see [[buildIndexUnstamped]] for why the stamp
    * is invalidated first and withheld on the rebuild-with-recovery
    * path.
    */
  private def buildVecIndexUnstamped(s: SparkSession, dir: String, ns: String): String = {
    val path = indexDir(dir, ns)
    clearStamp(path, "vec")
    val vecs = VecOps.emb(s, dir).select(col("vec_id"), col("emb"), col("norm"))
    vecs.write.mode(SaveMode.Overwrite).parquet(s"$path/vecs.parquet")
    // lineage sidecar (r13 verdict ask #3): both frames are
    // straight-plan (the memoized signature frame persists without
    // truncating its plan), so the map is computed from the written
    // frame — probe consumers trace to embeddings.embedding
    graft.plans.Lineage.writeSidecar(vecs, s"$path/vecs.parquet")
    // CORPUS-SIZED band width (r14 verdict ask #1): w is derived from
    // the source corpus size at build time (footer-metadata count, no
    // scan) and FROZEN into the artifact via the vec_w file — every
    // later signer (probe, incremental, novelty gate, append) reads the
    // stored w, never re-derives it, so appends to a grown corpus still
    // sign exactly like the build. A source-data change restamps
    // (dataStamp fingerprints the table bytes) and the rebuild
    // re-derives w — size-class staleness is subsumed by the data stamp.
    val w = VecOps.vecIndexBandBits(VecOps.vecCorpusN(s, dir))
    writeVecW(path, w)
    // band rows come from the session-memoized signature frame — shared
    // with the index-width warm frame, so signatures are computed once
    // per session no matter which consumer runs first (and can never
    // drift). Same probe-serving layout as the sim bands: (band,
    // bk)-sorted row groups, so the literal multi-probe predicates
    // stat-skip.
    val bands = VecOps.bandedSigsW(s, dir, w)
      .repartitionByRange(col("band"), col("bk"))
      .sortWithinPartitions(col("band"), col("bk"))
    bands.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/vec_bands.parquet")
    graft.plans.Lineage.writeSidecar(bands, s"$path/vec_bands.parquet")
    path
  }

  /** The artifact's frozen band width — written at build time beside
    * the tables, read by every probe/append signer. Same java.io
    * handling as the version stamps (the lake root is local in this
    * harness; both would move to the Hadoop FS API together).
    */
  private def vecWFile(path: String) = new java.io.File(s"$path/vec_w")

  private def writeVecW(path: String, w: Int): Unit = {
    val f = vecWFile(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, w.toString.getBytes("UTF-8"))
  }

  private[graft] def readVecW(path: String): Int = {
    val f = vecWFile(path)
    // loud, never a silent 16: signing a probe at a width other than
    // the build's returns WRONG (empty-ish) candidates with no error —
    // exactly the drift class the version stamps exist to prevent. A
    // missing file means the artifact predates the w-dial; the v3
    // version bump restamps those through the normal rebuild path.
    require(f.exists,
      s"[graft] vec index at $path has no vec_w width file — stale " +
        "pre-dial artifact; ensureVecIndex should have rebuilt it")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toInt
  }

  /** Vector-side novelty filter against the persisted ANN index: the
    * subset of `batch` (vec_id, embedding, …) with NO indexed vector of
    * cosine ≥ `minCos` — the embedding twin of [[novelDocs]] for a
    * streaming embedding feed (candidates from the persisted hyperplane
    * bands with Hamming-≤2 multi-probe, exact-cosine verify,
    * self-matches ignored so replays re-admit identically).
    * Within-batch: a vector with a ≥minCos partner of smaller vec_id in
    * the same batch is dropped (greedy, over-rejecting on chains — the
    * safe direction for admission).
    *
    * ZERO-NORM vectors (cosine undefined — the vector twin of a
    * token-less doc) cannot be signed and are admitted unconditionally,
    * in every batch: they are never gated against the index or each
    * other. Same trivially-novel contract as novelDocs; a feed that can
    * produce all-zero embeddings should filter or exact-dedup them
    * upstream of the gate.
    */
  private[graft] def novelVectors(s: SparkSession, dir: String,
                                  batch: DataFrame, minCos: Double,
                                  ns: String = ""): DataFrame = {
    VectorExprs.register(s)
    val path = ensureVecIndex(s, dir, ns)
    val w = readVecW(path) // sign at the artifact's frozen width
    // localCheckpoint: signed feeds the probe explosion, two embedding
    // broadcasts and the within-batch side — the ingest batch is the
    // bounded side by contract (same device as vec_index_incremental)
    val signed = batch.select(col("vec_id").as("b_id"),
        col("embedding").cast("array<double>").as("b_emb"))
      .withColumn("b_n", sqrt(call_function("dotp", col("b_emb"), col("b_emb"))))
      .filter(col("b_n") > 0)
      .withColumn("bands", VecOps.lshBandKeysW(col("b_emb"), w))
      .localCheckpoint()
    val bEmb = signed.select(col("b_id"), col("b_emb"), col("b_n"))
    // probe rows carry IDS ONLY (the r14 incremental fix, applied to
    // the gate in r15: riding b_emb through the ×(1+w+C(w,2)) mask
    // explosion ships a 64-double array per probe row)
    val qb = signed.select(col("b_id"), posexplode(col("bands")).as(Seq("band", "bk")))
    // multi-probe side: one probe row per (batch vector, band, mask)
    val qprobe = qb.select(col("b_id"), col("band"),
      explode(VecOps.probeKeysW(col("bk"), w)).as("bk"))
    val cos = call_function("dotp", col("emb"), col("b_emb")) / (col("norm") * col("b_n"))
    // candidate distinct on IDS ONLY, then the stored-vectors join with
    // the candidates as the BROADCAST side and the batch embeddings on
    // a second batch-sized broadcast — the vec_index_incremental
    // restructure (r15): the old shape ran the distinct over rows
    // carrying a 64-double b_emb each and then SMJ-shuffled the whole
    // stored embedding table per gate batch. Bounded like there —
    // candidates by |batch| × the width dial's ring budget, the batch
    // by the admission contract — but the ring bound only covers
    // RANDOM collisions (a duplicate-heavy batch vs a dense corpus
    // cluster scales candidates with |batch|×|cluster|), so both hints
    // are size-guarded: counts are cheap (localCheckpointed frames),
    // and above the dial the fetch degrades to a shuffle join.
    val candVsIndex = s.read.parquet(s"$path/vec_bands.parquet")
      .join(qprobe, Seq("band", "bk"))
      .filter(col("vec_id") =!= col("b_id")) // self-guard: replayed vectors
      .select(col("b_id"), col("vec_id")).distinct()
      .localCheckpoint()
    // byte bounds derived from each frame's actual schema
    // (Core.broadcastStats; the renamed o-side projection of bEmb has
    // identical row shape, so its stats are reused, not re-measured)
    val candVsStats = graft.Core.broadcastStats(candVsIndex)
    val bEmbStats = graft.Core.broadcastStats(bEmb)
    val dupVsIndex = s.read.parquet(s"$path/vecs.parquet")
      .join(graft.Core.guardedBroadcast(s, candVsIndex)(candVsStats), "vec_id")
      .join(graft.Core.guardedBroadcast(s, bEmb)(bEmbStats), "b_id")
      .filter(cos >= minCos)
      .select(col("b_id").as("vec_id")).distinct()
    val wcos = call_function("dotp", col("b_emb"), col("o_emb")) / (col("b_n") * col("o_n"))
    // within-batch: probe-expanded x side vs stored-key y side — same
    // Hamming-≤2 candidate rule as the index probe; ids pair first,
    // both embeddings re-join from the batch-sized broadcasts
    val dupInBatch = qprobe.as("x").join(qb.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
        col("x.b_id") > col("y.b_id"))
      .select(col("x.b_id").as("b_id"), col("y.b_id").as("o_id")).distinct()
      .join(graft.Core.guardedBroadcast(s, bEmb)(bEmbStats), "b_id")
      .join(graft.Core.guardedBroadcast(s,
        bEmb.select(col("b_id").as("o_id"), col("b_emb").as("o_emb"),
          col("b_n").as("o_n")))(bEmbStats), "o_id")
      .filter(wcos >= minCos)
      .select(col("b_id").as("vec_id")).distinct()
    batch.join(dupVsIndex.unionByName(dupInBatch), Seq("vec_id"), "left_anti")
  }

  /** Grow the persisted vector index with admitted vectors — the
    * embedding twin of [[appendToIndex]]; replayed appends add
    * byte-identical duplicate rows ([[compactIndex]] removes them at
    * rest; probes distinct candidate ids, so answers are unaffected).
    * Zero-norm vectors are unsignable and excluded — consistent with
    * [[novelVectors]] never gating them.
    */
  private[graft] def appendToVecIndex(s: SparkSession, dir: String,
                                      admitted: DataFrame, ns: String = ""): Unit = {
    appendToVecIndexAt(s, ensureVecIndex(s, dir, ns), admitted)
    maybeCompact(s, dir, ns, "vec_bands")  // see maybeCompact: the append path owns its cadence
  }

  /** Known-path append, no ensure — see [[appendToIndexAt]]. Appends
    * sign at the artifact's FROZEN width (vec_w): mixing widths in one
    * bands table would make stored keys incomparable. The dial only
    * moves on a REBUILD (source-data restamp), never on growth.
    */
  private[graft] def appendToVecIndexAt(s: SparkSession, path: String,
                                        admitted: DataFrame): Unit = {
    VectorExprs.register(s)
    val w = readVecW(path)
    val signed = admitted.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("norm", sqrt(call_function("dotp", col("emb"), col("emb"))))
      .filter(col("norm") > 0)
    signed.select(col("vec_id"), col("emb"), col("norm"))
      .write.mode(SaveMode.Append).parquet(s"$path/vecs.parquet")
    signed.select(col("vec_id"),
        posexplode(VecOps.lshBandKeysW(col("emb"), w)).as(Seq("band", "bk")))
      .write.mode(SaveMode.Append).parquet(s"$path/vec_bands.parquet")
  }

  private def ensureVecIndex(s: SparkSession, dir: String, ns: String = ""): String =
    ensureVecIndexStatus(s, dir, ns)._1

  /** Vec twin of [[ensureIndexStatus]] — same rebuild-with-recovery
    * stamping order (tables → recover → stamp).
    */
  private[graft] def ensureVecIndexStatus(s: SparkSession, dir: String,
                                          ns: String = "",
                                          recover: String => Unit = _ => ()): (String, Boolean) = {
    val path = indexDir(dir, ns)
    val stamp = vecStamp(dir) // captured pre-read, written verbatim
    if (!indexCurrent(path, Seq("vecs", "vec_bands"), "vec", stamp)) {
      buildVecIndexUnstamped(s, dir, ns)
      recover(path)
      writeStamp(path, "vec", stamp)
      (path, true)
    } else (path, false)
  }
}
