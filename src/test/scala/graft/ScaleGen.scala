package graft

/** SCALE.md harness (docs/SCALE.md): derive an N× corpus from a driver
  * scale factor so the heavy operators' scaling exponents can be
  * measured empirically (the driver ships sf0.001/0.01/0.1 only).
  *
  *   sbt "Test/runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sf1x 10"
  *
  * The copies are DECORRELATED so the result behaves like one corpus
  * 10× the size, not 10 interacting replicas:
  *   - documents: each copy's text goes through a copy-specific ALPHABET
  *     ROTATION (a bijective `translate` of a-z/A-Z). A bijective char
  *     map preserves every intra-copy relationship in BOTH similarity
  *     domains — token sets AND character 5-gram shingle sets map
  *     bijectively, so every Jaccard value inside a copy is unchanged —
  *     while cross-copy vocabularies and shingle sets are disjoint. (A
  *     first draft salted tokens with the copy index instead: that
  *     decorrelates the token domain but leaves character shingles
  *     nearly identical across copies — text_dedup_shingle then reports
  *     millions of REAL cross-copy near-dup pairs, an artifact of the
  *     generator, not a scaling property of the operator.)
  *   - embeddings: each copy's vectors have their dimensions ROTATED by
  *     the copy index — norms and intra-copy cosine geometry are
  *     untouched, while cross-copy vectors decorrelate.
  * Copy 0 is the identity: the source corpus is a subset of the output.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    // rotation is identity at i % 26 == 0 (text) and slice() misindexes
    // past the 64 dims (embeddings): more copies than either period
    // would silently reintroduce the cross-copy correlation artifacts
    // the scaladoc warns about
    require(copies >= 1 && copies <= 26,
      s"copies=$copies: alphabet/dimension rotation decorrelates at most 26 copies")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // events.ts passes through in whatever encoding the source uses —
      // legacy INT64 TIMESTAMP(NANOS) reads as long under this conf and
      // is copied as a plain long column; current timestamp[us] reads
      // and copies as TIMESTAMP_NTZ. Core.loadEvents branches on the
      // dtype it finds, so the copies stay readable either way.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val off = 10000000L
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String, i: Int) = s.drop(i % 26) + s.take(i % 26)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until copies).map { i =>
      docs.withColumn("doc_id", $"doc_id" + lit(off * i))
        .withColumn("text",
          if (i == 0) $"text"
          else translate($"text", lower + upper, rot(lower, i) + rot(upper, i)))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until copies).map { i =>
      emb.withColumn("vec_id", $"vec_id" + lit(off * i))
        .withColumn("embedding",
          if (i == 0) $"embedding"
          else concat(slice($"embedding", i + 1, 64 - i), slice($"embedding", 1, i)))
    }.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // relational tables for the join/dimension operators: offsetting
    // every key by the same per-copy stride keeps each copy
    // self-joined (orders meet only their own lineitem, selectivities
    // and per-key fan-outs unchanged) — the relational analogue of the
    // alphabet rotation
    for ((t, keys) <- Seq(
        "orders" -> Seq("o_orderkey", "o_custkey"),
        "lineitem" -> Seq("l_orderkey"),
        "customer" -> Seq("c_custkey"),
        "events" -> Seq("event_id", "user_id"))) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      (0 until copies).map { i =>
        keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(off * i)))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // dimension tables copy VERBATIM: dims grow with entities, not
    // event volume — at 10x the facts they stay dim-sized (the
    // broadcast-join scale story), and the copied facts keep their
    // original dim keys so every dim join still resolves
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"[scalegen] wrote $out at ${copies}x of $src")
    spark.stop()
  }
}
