package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic for the trained-quantizer embed-dedup path — stage
  * timing for hashDocVectors / Lloyd / assignments / verify, run with
  *   sbt "Test/runMain graft.AnnDiag <sfDir>"
  */
object AnnDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[anndiag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val dv = t("hashDocVectors") {
      val d = queries.EmbedOps.hashDocVectors(spark, sfDir).filter($"norm" > 0)
      d.count(); d
    }
    val vecs = dv.select($"doc_id".as("vec_id"), $"v".as("emb"), $"norm")
    val n = t("count")(vecs.count())
    val k = math.max(16, math.ceil(math.sqrt(4.0 * n)).toInt)
    println(s"[anndiag] n=$n k=$k")
    val cents = t("lloydTrain")(queries.VecOps.lloydTrain(vecs, k, 64, rounds = 1).localCheckpoint())
    val first = t("assign1")(queries.VecOps.assignCellIds(vecs, cents).localCheckpoint())
    val second = queries.VecOps.assignSecondCellIds(vecs, cents, first)
    val cells = t("assignTop2")(first.unionByName(second)
      .select($"vec_id".as("doc_id"), $"c_id".as("ck")).localCheckpoint())
    val keyed = dv.join(cells, "doc_id")
    val a = keyed.select($"ck", $"doc_id".as("a_id"), $"v".as("va"), $"norm".as("na"))
    val b = keyed.select($"ck", $"doc_id".as("b_id"), $"v".as("vb"), $"norm".as("nb"))
    val pairs = a.join(b, Seq("ck")).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        round(call_function("dotp", $"va", $"vb") / ($"na" * $"nb"), 6).as("sim"))
      .filter($"sim" >= 0.95)
      .distinct()
    val np = t("verify-pairs")(pairs.count())
    println(s"[anndiag] pairs=$np")
    val candMass = t("cand-mass") {
      val occ = cells.groupBy($"ck").count()
      occ.agg(sum($"count" * ($"count" - 1) / 2)).first().getLong(0)
    }
    println(s"[anndiag] cand_mass=$candMass")
    spark.stop()
  }
}
