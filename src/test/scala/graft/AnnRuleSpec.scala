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
      // guard over the WRONG column: a sqrt-self-dot filter that norms
      // something other than the scored embedding is not the declared
      // guard — accepting it would drop the zero-norm rows the (still
      // unguarded) exact form ranks first
      val wrongCol = array($"vec_id".cast("double"))
      val wrongGuard = graft.queries.VecOps.emb(spark, dir)
        .filter(sqrt(call_function("dotp", wrongCol, wrongCol)) > 0)
        .orderBy(score(6).desc, $"vec_id")
        .select($"vec_id", score(6).as("score")).limit(5)
      val p5 = wrongGuard.queryExecution.executedPlan.toString
      assert(p5.contains("embeddings.parquet") && !p5.contains("ivf_cells"),
        "a guard on a different column must NOT count as the zero-norm guard")
    } finally spark.conf.set("spark.graft.ann.rewrite", "false")
  }

  test("filtered form: a label equality becomes a residual predicate inside the widened probe") {
    graft.plans.AnnTopKRule.install(spark)
    graft.queries.IvfIndex.ensureIvfIndex(spark, dir)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val lbl = labels(0L)
    // exact semantics first (rule off): filter-then-rank brute force
    val exactFiltered = exactTopK(q0, Int.MaxValue)
      .filter { case (id, _) => labels(id) == lbl }
    val exactDf = graft.plans.AnnTopK.cosineTopKWhere(spark, dir, q0, 5, Seq("label" -> lbl))
    assert(exactDf.as[(Long, Double)].collect().toSeq == exactFiltered.take(5),
      "exact filtered form must equal brute-force filter-then-rank")
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val df = graft.plans.AnnTopK.cosineTopKWhere(spark, dir, q0, 5, Seq("label" -> lbl))
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("ivf_cells"), "filtered form must probe the persisted cells")
      assert(!phys.contains("embeddings.parquet"),
        "the filtered rewrite must evaluate the residual on STORED metadata, not a corpus join-back")
      val rows = df.as[(Long, Double)].collect().toSeq
      // the query is corpus vector 0 and matches its own label: its own
      // cell tops the widened ring, so the self-hit must lead
      assert(rows.nonEmpty && rows.head == ((0L, 1.0)), s"self-hit missing: ${rows.headOption}")
      assert(rows.forall { case (id, _) => labels(id) == lbl },
        s"residual not honored: ${rows.filter(r => labels(r._1) != lbl)}")
      // every surfaced score is the exact cosine for that id
      val exactById = exactFiltered.toMap
      rows.foreach { case (id, s) =>
        assert(math.abs(s - exactById(id)) < 1e-9, s"id $id: $s vs ${exactById(id)}")
      }
      // every label on this fixture has sel ≈ 0.1 < nprobe/K = 0.125,
      // so the selectivity-scaled ring saturates to full-K — the
      // filtered probe scans every (pruned) cell and must equal the
      // exact filter-then-rank answer outright, the contract the old
      // fixed 2x widening could not make (it recalled 3-4 of 5 here)
      assert(rows == exactFiltered.take(5),
        s"saturated-ring filtered probe must be exact: $rows vs ${exactFiltered.take(5)}")
    } finally spark.conf.set("spark.graft.ann.rewrite", "false")
  }

  test("filtered ring scales with estimated selectivity; unseen values keep the exact plan") {
    // Synthetic skewed-label corpus: same vectors as the fixture,
    // labels re-dealt so the stats-driven widening has distinct
    // regimes — 0: sel=.5 (ring 16), 1: sel=.3 (ring 27), 2: sel=.2
    // (ring 40); label 9 never occurs (no estimate → no rewrite).
    val tmp = java.nio.file.Files.createTempDirectory("graft-annsel").toString
    try {
      spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("label",
          when($"vec_id" < 250, 0).when($"vec_id" < 400, 1).otherwise(2))
        .write.parquet(s"$tmp/embeddings.parquet")
      graft.plans.AnnTopKRule.install(spark)
      graft.queries.IvfIndex.ensureIvfIndex(spark, tmp)
      val st = graft.queries.IvfIndex.readMetaStats(
        graft.queries.IndexOps.indexDir(tmp)).get
      assert(st.complete("label") && st.counts(("label", "0")) == 250L,
        s"build-time stats must record the label histogram: $st")
      spark.conf.set("spark.graft.ann.rewrite", "true")
      val exactAll = exactTopK(q0, Int.MaxValue)
      val labelOf = (id: Long) => if (id < 250) 0 else if (id < 400) 1 else 2
      for ((lbl, ring) <- Seq(0 -> 16, 1 -> 27, 2 -> 40)) {
        val df = graft.plans.AnnTopK.cosineTopKWhere(spark, tmp, q0, 5, Seq("label" -> lbl))
        val phys = df.queryExecution.executedPlan.toString
        // plan rendering truncates the long tmp path before the
        // "ivf_cells" segment — absence of the corpus scan plus the
        // probe's cell-ring limit pins the rewrite just as tightly
        assert(!phys.contains("embeddings.parquet"), s"label=$lbl must rewrite to the probe")
        assert(phys.contains(s"limit=$ring"),
          s"label=$lbl (sel=${250 - lbl * 50}/500) must probe a $ring-cell ring:\n" +
            phys.linesIterator.filter(_.contains("limit=")).mkString("\n"))
        val got = df.as[(Long, Double)].collect().toSeq
        val want = exactAll.filter { case (id, _) => labelOf(id) == lbl }.take(5)
        val hit = got.map(_._1).toSet.intersect(want.map(_._1).toSet).size
        // the scaled ring's contract is PARITY with the unfiltered
        // probe's recall, whose floor on these RANDOM vectors (no
        // cluster structure — see the vec_ann_ivf floor rationale) is
        // itself 2-4/5; measured here: 3-5/5 across the three regimes
        assert(hit >= 2, s"label=$lbl recall collapsed to $hit/5 at ring $ring")
      }
      // a value the build-time stats never saw: the rule must keep the
      // exact corpus plan rather than guess a ring
      val unseen = graft.plans.AnnTopK.cosineTopKWhere(spark, tmp, q0, 5, Seq("label" -> 9))
      val up = unseen.queryExecution.executedPlan.toString
      assert(up.contains("embeddings.parquet") && !up.contains("ivf_cells"),
        "unseen label must keep the exact plan")
      assert(unseen.count() == 0)
    } finally {
      spark.conf.set("spark.graft.ann.rewrite", "false")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("cluster deployment path: the rule fires when injected via spark.sql.extensions (fresh JVM)") {
    // spark.sql.extensions is a static conf — it cannot retrofit this
    // suite's live SparkContext — and injectOptimizerRule places the
    // rule inside the main optimizer fixpoint, a genuinely different
    // execution context from the install() post-hoc batch the other
    // tests drive (the rewrite re-enters the optimizer from within an
    // executing optimizer there). Drive it end-to-end in a child JVM;
    // in THIS suite (not a parallel one) so it never races the
    // stale-stamp test's deliberate stamp corruption below.
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", System.getProperty("java.class.path"),
      "graft.AnnInjectedMain", dir)
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd, new java.io.File(".")).!(
      scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
                                      l => out.append(l).append('\n')))
    assert(rc == 0 && out.toString.contains("ANN_INJECTED_OK"),
      s"injected-extension child JVM failed (rc=$rc):\n${out.toString.takeRight(4000)}")
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
