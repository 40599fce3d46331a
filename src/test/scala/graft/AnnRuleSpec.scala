package graft

import org.apache.spark.sql.functions._

/** AnnTopKRule (SURVEY §4.3(b)): the opt-in optimizer rule that swaps
  * the exact cosine-top-k plan for the persisted IVF probe. Contracts:
  * off by default (exact plan, exact results), fires only with BOTH the
  * session opt-in AND a current index stamp, never builds an index from
  * inside the optimizer, and the rewritten plan re-ranks with exact
  * cosines (approximation bounds WHICH vectors are scored, never the
  * score).
  */
class AnnRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def q0: Seq[Double] = spark.read.parquet(s"$dir/embeddings.parquet")
    .filter($"vec_id" === 0)
    .selectExpr("cast(embedding as array<double>) as e")
    .as[Seq[Double]].collect().head

  private def exactTopK(q: Seq[Double], k: Int): Seq[(Long, Double)] = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Seq[Double])].collect().toSeq
      .map { case (id, e) =>
        val n = math.sqrt(e.map(x => x * x).sum)
        val c = e.zip(q).map { case (x, y) => x * y }.sum / (n * qn)
        (id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("rule off by default: exact plan over the corpus, brute-force-equal results") {
    graft.plans.AnnTopKRule.install(spark)
    val df = graft.plans.AnnTopK.cosineTopK(spark, dir, q0, 5)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("embeddings.parquet"), "exact form must scan the corpus")
    assert(!phys.contains("ivf_cells"), "no rewrite without the session opt-in")
    assert(df.as[(Long, Double)].collect().toSeq == exactTopK(q0, 5))
  }

  test("opt-in + current index: plan swaps to the IVF probe; re-rank scores stay exact") {
    graft.plans.AnnTopKRule.install(spark)
    graft.queries.IvfIndex.ensureIvfIndex(spark, dir)
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val df = graft.plans.AnnTopK.cosineTopK(spark, dir, q0, 5)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("ivf_cells"), "opt-in must probe the persisted cells")
      assert(!phys.contains("embeddings.parquet"),
        "the rewritten plan must not scan the corpus table")
      val rows = df.as[(Long, Double)].collect().toSeq
      assert(rows.nonEmpty && rows.size <= 5)
      // the query IS corpus vector 0, whose own cell is the top probe
      // cell — the self-hit at cosine 1.0 must lead the result
      assert(rows.head == (0L, 1.0), s"self-hit missing: ${rows.head}")
      // approximation bounds the candidate set only: every returned
      // score equals the exact cosine for that id
      val exactById = exactTopK(q0, Int.MaxValue).toMap
      rows.foreach { case (id, s) =>
        assert(math.abs(s - exactById(id)) < 1e-9, s"id $id: $s vs ${exactById(id)}")
      }
    } finally spark.conf.set("spark.graft.ann.rewrite", "false")
  }

  test("rule refuses near-miss shapes: extra predicate or different round scale keeps the exact plan") {
    // The matcher's contract is "this IS the declared form" — a
    // superset match would let the rewrite silently drop a user
    // predicate or change score precision (round-6 review finding).
    graft.plans.AnnTopKRule.install(spark)
    graft.queries.IvfIndex.ensureIvfIndex(spark, dir)
    graft.functions.VectorExprs.register(spark)
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val qn = math.sqrt(q0.map(x => x * x).sum)
      val base = graft.queries.VecOps.emb(spark, dir).filter($"norm" > 0)
      def score(scale: Int) =
        round(call_function("dotp", $"emb", typedlit(q0)) / ($"norm" * lit(qn)), scale)
      // extra user predicate between the sort and the scan
      val withPred = base.filter($"vec_id" % 2 === 0)
        .orderBy(score(6).desc, $"vec_id")
        .select($"vec_id", score(6).as("score")).limit(5)
      val p1 = withPred.queryExecution.executedPlan.toString
      assert(p1.contains("embeddings.parquet") && !p1.contains("ivf_cells"),
        "a plan with an extra predicate must NOT be rewritten")
      assert(withPred.as[(Long, Double)].collect().forall(_._1 % 2 == 0),
        "the predicate must be honored")
      // same silhouette, different score precision
      val scale2 = base.orderBy(score(2).desc, $"vec_id")
        .select($"vec_id", score(2).as("score")).limit(5)
      val p2 = scale2.queryExecution.executedPlan.toString
      assert(p2.contains("embeddings.parquet") && !p2.contains("ivf_cells"),
        "a different round scale must NOT be rewritten")
      // reordered projection (score first) — positional remap would
      // transpose columns, so the matcher must refuse
      val swapped = base.orderBy(score(6).desc, $"vec_id")
        .select(score(6).as("score"), $"vec_id").limit(5)
      val p3 = swapped.queryExecution.executedPlan.toString
      assert(p3.contains("embeddings.parquet") && !p3.contains("ivf_cells"),
        "a reordered projection must NOT be rewritten")
      // MISSING zero-norm guard: the probe filters norm > 0, so
      // rewriting a guard-less exact plan would silently drop the
      // NaN-scored zero-norm rows the exact form ranks first
      val noGuard = graft.queries.VecOps.emb(spark, dir)
        .orderBy(score(6).desc, $"vec_id")
        .select($"vec_id", score(6).as("score")).limit(5)
      val p4 = noGuard.queryExecution.executedPlan.toString
      assert(p4.contains("embeddings.parquet") && !p4.contains("ivf_cells"),
        "a plan without the zero-norm guard must NOT be rewritten")
    } finally spark.conf.set("spark.graft.ann.rewrite", "false")
  }

  test("opt-in but stale index stamp: rule stays off and never builds from the optimizer") {
    graft.plans.AnnTopKRule.install(spark)
    graft.queries.IvfIndex.ensureIvfIndex(spark, dir)
    val stamp = new java.io.File(graft.queries.IndexOps.indexDir(dir) + "/ivf.version")
    val good = new String(java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8")
    java.nio.file.Files.write(stamp.toPath, "ivf-v0:obsolete".getBytes("UTF-8"))
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val df = graft.plans.AnnTopK.cosineTopK(spark, dir, q0, 5)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("embeddings.parquet") && !phys.contains("ivf_cells"),
        "a stale index must keep the exact plan")
      // side-effect freedom: planning must not have rebuilt/restamped
      val after = new String(java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8")
      assert(after == "ivf-v0:obsolete", "optimizer must never build an index")
    } finally {
      spark.conf.set("spark.graft.ann.rewrite", "false")
      java.nio.file.Files.write(stamp.toPath, good.getBytes("UTF-8"))
    }
  }
}
