package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IVFIndex
import graft.profile.ProfileTrainer
import graft.search.{BoundedSearch, FlatSearch}

/** Dev tool (VERDICT r11 #3): locate the driver-staged / lazy boundary
  * for deep-schedule bounded search. `searchStagedDriver` (one Spark
  * action per adaptive round, O(active·k) driver state) was added in
  * r11 and halved the micro-batch job floor, but
  * [[graft.GraftConf.eagerMaxQueries]] = 4096 predates it — nothing
  * measured where the lazy cached-ctrl rounds (~3 actions + cache
  * churn per round, zero driver decision state) actually overtake it.
  * This A/B runs both arms on the SAME corpus/model/traces at
  * nq ∈ {2048, 4096, 8192, 16384}, twice each, asserting the two arms'
  * per-query decisions are bit-identical (the BoundedSearchSpec
  * equivalence contract, re-checked here at scale).
  *
  * run: sbt "runMain graft.tools_dev.StagedDriverAB [n] [nlist]"
  * (defaults 2000000 / 512 — levels > 4, the deep-schedule regime)
  */
object StagedDriverAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val nlist = if (args.length > 1) args(1).toInt else 512
    val d = 64; val k = 10
    println(s"corpus: $n × $d, nlist=$nlist")

    // ScaleDemo's distributed seeded generator (same cluster structure)
    val nClusters = 256
    val gen = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      val c = new scala.util.Random((id % nClusters) * 7919 + 1)
      Array.fill(d)((c.nextGaussian() + 0.15 * r.nextGaussian()).toFloat)
    }
    val baseDF = spark.range(n).toDF("id")
      .withColumn("vec", gen(col("id"))).cache()
    baseDF.count()

    var t = System.nanoTime()
    val frac = math.min(0.25, math.max(0.05, 800.0 * nlist / n))
    val model = IVFIndex.train(baseDF.sample(frac, 42L), nlist)
    println(f"kmeans: ${(System.nanoTime() - t) / 1e9}%.1fs")
    val ivf = IVFIndex.assign(baseDF, model).cache()
    ivf.count()

    t = System.nanoTime()
    val trainQ = baseDF.orderBy(col("id").desc).limit(500)
      .select(col("id").as("qid"), col("vec"))
    val gt = FlatSearch.knn(baseDF, trainQ, k)
    val traces = ProfileTrainer.train(ivf, model, trainQ, gt, k)
    println(f"profile (500 queries): ${(System.nanoTime() - t) / 1e9}%.1fs, " +
      s"levels=${traces.length}")
    require(traces.length > 4, "need a deep schedule (levels > 4)")

    def run(qdf: org.apache.spark.sql.DataFrame,
            lazyArm: Boolean): (Double, Map[Long, Int]) = {
      // the driver arm must not be re-routed by the default 4096 cap —
      // that cap is exactly what this A/B exists to re-measure
      if (!lazyArm) System.setProperty("graft.eager.maxQueries", "1000000")
      try {
        val t0 = System.nanoTime()
        val r = BoundedSearch.search(ivf, model, traces, qdf, k,
          multiplier = 4.0f, stdM = 1.0f, forceLazy = lazyArm)
        r.results.count()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, r.stats.map(s => s.qid -> s.nprobeUsed).toMap)
      } finally if (!lazyArm) System.clearProperty("graft.eager.maxQueries")
    }

    // one untimed warmup pass per arm (JIT/codegen)
    val warmQ = baseDF.filter(col("id") % (n / 512) === 0).limit(512)
      .select(col("id").as("qid"), col("vec"))
      .withColumn("required_recall", lit(0.9f)).cache()
    warmQ.count()
    run(warmQ, lazyArm = false); run(warmQ, lazyArm = true)
    warmQ.unpersist()

    // third arg overrides the nq ladder (comma-separated)
    val sizes = if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(2048, 4096, 8192, 16384)
    println("nq      arm     run1_s  run2_s  best_ms/q  mean_nprobe")
    for (nq <- sizes) {
      val qdf = baseDF.filter(col("id") % (n / nq) === 0).limit(nq)
        .select(col("id").as("qid"), col("vec"))
        .withColumn("required_recall", lit(0.9f)).cache()
      val actual = qdf.count()
      val arms = Seq(("driver", false), ("lazy  ", true)).map {
        case (lbl, lz) =>
          val (s1, d1) = run(qdf, lz)
          val (s2, d2) = run(qdf, lz)
          require(d1 == d2, s"$lbl arm non-deterministic at nq=$actual")
          (lbl, s1, s2, d1)
      }
      require(arms(0)._4 == arms(1)._4,
        s"arms disagree on decisions at nq=$actual")
      val meanNp = arms(0)._4.values.sum.toDouble / actual
      arms.foreach { case (lbl, s1, s2, _) =>
        val best = math.min(s1, s2)
        println(f"$actual%6d  $lbl  $s1%6.1f  $s2%6.1f  " +
          f"${best * 1000 / actual}%9.2f  $meanNp%11.1f")
      }
      qdf.unpersist()
    }
    spark.stop()
  }
}
