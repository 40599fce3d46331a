package graft

import org.apache.spark.sql.functions._

/** The d=0 pre-dedup in vec_knn_join_lsh (r15 verdict ask #3): vectors
  * with identical full LSH signatures — exact-duplicate embeddings, the
  * COMMON case in a real lake — collapse to one representative before
  * the Hamming-midpoint probe expansion, and members rejoin on the
  * rep-level candidate stream. Two pins, the two ways the rewrite can
  * break:
  *  1. output EQUIVALENCE on a planted duplicate-heavy corpus, against
  *     an independent Scala replay of the contract (band-key Hamming ≤2
  *     candidates → exact cosine → per-vector top-3) — not against the
  *     entry's own plan;
  *  2. the collapse PREMISE: every duplicate lands in its base's
  *     signature group, so the probe stream (groups · 4 bands · (1+w)
  *     keys) scales with DISTINCT signatures, not members.
  */
class LshDupSpec extends SparkSpecBase {
  import spark.implicits._

  test("vec_knn_join_lsh: duplicate-heavy corpus — replay-identical output, probe mass scales with signature groups") {
    // 60 distinct base vectors; 140 EXACT duplicates spread over the
    // first 20 bases (7 copies each) — the re-ingested-cluster shape
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 2f), i % 5L)
    }
    val dups = (0 until 140).map { j =>
      val src = base(j % 20)
      (1000L + j, src._2, src._3)
    }
    val all = base ++ dups
    val dir = java.nio.file.Files.createTempDirectory("lshdup").toString
    all.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("vec_knn_join_lsh")(spark, dir)
      .select($"a_id", $"rnk", $"b_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet

    // ---- independent replay of the declared contract ----
    val w = queries.VecOps.lshBandBits(all.size.toLong)
    val sigs = queries.VecOps.bandedSigsW(spark, dir, w)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    // premise: every duplicate shares its base's full signature —
    // distinct signature groups == distinct embeddings (60), so the
    // probe stream is 60·4·(1+w) rows, not 200·4·(1+w)
    val groups = sigs.values.toSeq.distinct.size
    assert(groups == 60, s"expected 60 signature groups (one per " +
      s"distinct embedding), got $groups — the collapse premise broke")
    val embs = all.map { case (id, v, _) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      dab / (math.sqrt(daa) * math.sqrt(dbb))
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = all.map(_._1)
    val expected = ids.flatMap { a =>
      val cands = ids.filter { b =>
        b != a && (0 until 4).exists(band =>
          java.lang.Long.bitCount(sigs(a)(band) ^ sigs(b)(band)) <= 2)
      }
      cands.map(b => (b, round6(cos(embs(a), embs(b)))))
        .sortBy { case (b, sc) => (-sc, b) }
        .take(3).zipWithIndex
        .map { case ((b, sc), i) => (a, i + 1, b, sc) }
    }.toSet
    assert(out == expected,
      s"entry vs replay: only-entry=${(out -- expected).take(5)} " +
        s"only-replay=${(expected -- out).take(5)}")
    // and the planted duplicates actually exercise the rejoin: each
    // duplicate's top-1 is one of its exact copies at score 1.0
    val top1 = out.filter(_._2 == 1).map(t => t._1 -> t._4).toMap
    assert((0 until 20).forall(i => top1(i.toLong) == 1.0),
      "each duplicated base must rank an exact copy first")
  }
}
