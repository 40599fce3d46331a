package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Core._

/** In-engine TRAINED quality classifier — the learned counterpart of
  * the rule battery (`text_gopher_rules`): a hashed-bag-of-tokens
  * logistic regression, the fastText-style scorer every major
  * pretraining pipeline runs after its hard rules (CCNet, Wenzek et
  * al. 2020; GPT-3's "high-quality vs Common Crawl" filter, Brown et
  * al. 2020 App. A; the reference's corpus-prep surface is
  * engine.py:65-98). The synthetic corpus carries no human labels, so
  * the training target is a deterministic quality PROXY — the
  * distinct-token-ratio median split (2·nd > nt), the same signal
  * curate_token_budget ranks by — but the op CONTRACT is the real
  * pipeline shape: a labeled seed set in, a model-sized weight vector
  * out, the whole lake scored by one broadcast-join map pass.
  *
  * Determinism discipline: the seed rows are canonically sorted before
  * the in-driver GD loop, so every sum is a fixed-order sequential
  * reduction — the weights are bit-identical on any parallelism, any
  * rerun (spec-pinned), with no float-order caveats at all.
  *
  * Scale shape (100 TB): the corpus enters only through (a) the seed
  * collect — bounded by contract and guarded at
  * `spark.graft.classifier.maxSeedDocs` — and (b) the APPLY pass,
  * which is one broadcast join of the 65-row model into the persisted
  * (doc, dim, count) feature frame (one explode-aggregate off the
  * memoized termFreq materialization) plus two bounded aggregates: no
  * training work, no corpus-wide shuffle of text, the model rather
  * than the data crossing the driver boundary.
  */
object QualityOps {

  private val DIMS  = 64
  private val BIAS  = DIMS.toLong // bias feature index
  private val ITERS = 300
  private val LR    = 0.5
  private val MOMENTUM = 0.95

  private val cacheLock = new Object
  private val featCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Array[Double]]

  private def cacheKey(s: SparkSession, dir: String) =
    (s, dir, s.conf.get("spark.sql.shuffle.partitions", ""))

  /** (doc_id, y, dim, x) sparse feature frame: token counts hashed into
    * 64 signed-free buckets + a constant bias feature, label = the
    * quality-proxy median split 2·nd > nt (exact integer test). One
    * aggregate over the shared termFreq frame; persisted — every
    * training iteration and the apply pass reread cached blocks.
    */
  private[graft] def features(s: SparkSession, dir: String): DataFrame =
    cacheLock.synchronized { featCache.getOrElseUpdate(cacheKey(s, dir), {
      import s.implicits._
      val tf = TextOps.termFreq(s, dir)
      val lab = tf.groupBy($"doc_id")
        .agg(sum($"tf").as("nt"), count(lit(1)).as("nd"))
        .select($"doc_id", ($"nd" * 2 > $"nt").cast("int").as("y"))
      val hashed = tf
        .select($"doc_id", pmod(xxhash64($"term"), lit(DIMS.toLong)).as("dim"), $"tf")
        .groupBy($"doc_id", $"dim").agg(sum($"tf").as("x"))
      val bias = lab.select($"doc_id", lit(BIAS).as("dim"), lit(1L).as("x"))
      hashed.unionByName(bias).join(lab, "doc_id").persist()
    })
    }

  /** Momentum-GD logistic weights, w[0..63] = hashed dims, w[64] = bias.
    *
    * Trains on a deterministic quarter SEED SET (doc_id ≡ 0 mod 4) —
    * the real pipeline shape: quality classifiers fit a small labeled
    * seed sample (fastText's regime: seed fitting is single-node by
    * design), then score the whole lake distributed. The seed feature
    * rows collect ONCE to the driver — a bounded collect by contract,
    * guarded loudly at `spark.graft.classifier.maxSeedDocs` (default
    * 200k docs ≈ model-training scale; a 100 TB lake trains on a seed
    * this size, never on the lake) — and the K GD iterations run as
    * in-driver array math: zero per-iteration Spark jobs, and
    * bit-determinism for free (sequential fixed-order sums after a
    * canonical (doc, dim) sort, no partition-order effects at all).
    */
  private[graft] def trainedWeights(s: SparkSession, dir: String): Array[Double] =
    cacheLock.synchronized { modelCache.getOrElseUpdate(cacheKey(s, dir), {
      import s.implicits._
      val maxSeed = s.conf.get("spark.graft.classifier.maxSeedDocs", "200000").toLong
      val rows = features(s, dir).filter(pmod($"doc_id", lit(4)) === 0)
        .select($"doc_id", $"dim", $"x", $"y")
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._2))
      val docs = rows.map(_._1).distinct
      require(docs.length <= maxSeed,
        s"quality classifier seed set has ${docs.length} docs " +
          s"(> spark.graft.classifier.maxSeedDocs=$maxSeed) — the seed is " +
          "a labeled SAMPLE by contract; shrink the seed filter, don't " +
          "train on the lake")
      val docIdx = docs.zipWithIndex.toMap
      val n = docs.length
      val y = new Array[Double](n)
      val feat = Array.fill(n)(List.empty[(Int, Double)])
      rows.foreach { case (d, dim, x, yy) =>
        val i = docIdx(d)
        y(i) = yy.toDouble
        feat(i) = (dim.toInt, x.toDouble) :: feat(i)
      }
      val w = new Array[Double](DIMS + 1)
      val v = new Array[Double](DIMS + 1)
      val g = new Array[Double](DIMS + 1)
      for (_ <- 0 until ITERS) {
        java.util.Arrays.fill(g, 0.0)
        var i = 0
        while (i < n) {
          var score = 0.0
          feat(i).foreach { case (d, x) => score += w(d) * x }
          val resid = 1.0 / (1.0 + math.exp(-score)) - y(i)
          feat(i).foreach { case (d, x) => g(d) += resid * x }
          i += 1
        }
        var d = 0
        while (d <= DIMS) {
          v(d) = MOMENTUM * v(d) + g(d) / n
          w(d) -= LR * v(d)
          d += 1
        }
      }
      w
    })
    }

  private[graft] def evictCaches(s: SparkSession): Unit =
    cacheLock.synchronized {
      featCache.filterInPlace { case ((sess, _, _), df) =>
        if (sess eq s) { df.unpersist(); false } else true
      }
      modelCache.filterInPlace { case ((sess, _, _), _) => !(sess eq s) }
      ()
    }

  val entries: Seq[Entry] = Seq(

    entryNoOracle("quality_classifier_train") { (s, dir) =>
      import s.implicits._
      // Declared output = the model itself: 65 (dim, weight) rows —
      // hashed token dims 0..63 + bias 64. No SQL oracle (iterative
      // optimization isn't SQL-expressible); the spec gate asserts the
      // learned model beats the majority class by a wide margin and
      // that retraining under a different partitioning reproduces the
      // weights bit-for-bit (the canonical-sort determinism claim).
      val w = trainedWeights(s, dir)
      s.createDataFrame(w.zipWithIndex.toSeq.map { case (v, d) => (d.toLong, v) })
        .toDF("dim", "weight")
        .select($"dim", round($"weight", 6).as("weight"))
        .orderBy($"dim")
    },

    entryNoOracle("quality_classifier_apply") { (s, dir) =>
      import s.implicits._
      // Score the whole corpus with the trained model and report the
      // per-source filter audit: docs kept at p ≥ 0.5, label base rate,
      // and classifier/proxy agreement — the table an operator reads
      // before committing a learned filter to the pipeline. One
      // broadcast join of the 65-row model into the persisted feature
      // frame + two bounded aggregates; at 100 TB this is the serving
      // path (no training work, no corpus-wide shuffle of text).
      val wDf = broadcast(
        s.createDataFrame(trainedWeights(s, dir).zipWithIndex.toSeq.map {
          case (v, d) => (d.toLong, v)
        }).toDF("dim", "w"))
      val src = load(s, dir, "documents").select($"doc_id", $"source")
      features(s, dir)
        .join(wDf, "dim")
        .groupBy($"doc_id", $"y").agg(sum($"x" * $"w").as("score"))
        .select($"doc_id", $"y",
          (lit(1.0) / (lit(1.0) + exp(-$"score")) >= 0.5).cast("int").as("pred"))
        .join(src, "doc_id")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"pred").as("n_kept"),
          sum($"y").as("n_label_pos"),
          sum(($"pred" === $"y").cast("long")).as("n_agree"),
          round(avg(($"pred" === $"y").cast("double")), 4).as("accuracy"))
        .orderBy($"source")
    }
  )
}
