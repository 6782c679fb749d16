package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.index.IVFIndex
import graft.profile.ProfileTrainer
import graft.search.{BoundedSearch, FlatSearch, IVFSearch}

/** Reference-parity evaluation harness (the Spark twin of
  * `Auncel/eval/{bound,effect_error,effect_time,overhead}.cpp`):
  * seeded clustered data, IVF build, profile training, then
  *
  *   bound    — bounded-error search at ε; prints per-query probe
  *              counts and the reference's acceptance line when the
  *              worst-case distance-threshold recall ≥ 1−ε
  *              (`eval/bound.cpp:400-414`)
  *   effect   — required recalls 0.1…0.9 round-robin; reports
  *              achieved vs required per bucket (`effect_error.cpp`)
  *   overhead — profile-enabled search time vs fixed-nprobe scan of
  *              the same probe budget (`overhead.cpp`)
  *
  * Usage: runMain graft.Eval [bound|effect|overhead] [outDir]
  */
object Eval {
  val D = 32; val K = 20; val NLIST = 64
  val NB = 20000; val NTRAIN = 300; val NEVAL = 200
  val MULT = 8.0f; val STDM = 1.5f

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("bound")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_eval"
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // seeded clustered corpus (the structure the reference's datasets have)
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(48)(Array.fill(D)(rnd.nextGaussian().toFloat))
    def mk(n: Int) = Array.fill(n) {
      val c = centers(rnd.nextInt(48))
      Array.tabulate(D)(i => (c(i) + 0.15 * rnd.nextGaussian()).toFloat)
    }
    val base = mk(NB); val trainQ = mk(NTRAIN); val evalQ = mk(NEVAL)
    def df(vs: Array[Array[Float]], idCol: String) =
      vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF(idCol, "vec")

    val baseDF = df(base, "id").cache()
    val t0 = now()
    val model = IVFIndex.train(baseDF, NLIST)
    val assigned = IVFIndex.assign(baseDF, model).cache()
    assigned.count()
    val tBuild = now() - t0

    val t1 = now()
    val gt = FlatSearch.knn(baseDF, df(trainQ, "qid"), K).cache()
    val traces = ProfileTrainer.train(assigned, model, df(trainQ, "qid"), gt, K, bs = 100)
    val tProfile = now() - t1

    // exact k-th GT distance per eval query (in-driver oracle)
    def kth(q: Array[Float]): Double =
      base.map(v => Kernels.l2Sqr(q, v)).sorted.apply(K - 1)

    mode match {
      case "bound" =>
        val eps = 0.2
        val qdf = evalQ.zipWithIndex
          .map { case (v, i) => (i.toLong, v, (1 - eps).toFloat) }
          .toSeq.toDF("qid", "vec", "required_recall")
        val t2 = now()
        val res = BoundedSearch.search(assigned, model, traces, qdf, K, MULT, STDM)
        val got = res.results.select(col("qid"), col("dist"))
          .as[(Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val tSearch = now() - t2
        val recalls = evalQ.zipWithIndex.map { case (q, i) =>
          val kd = kth(q)
          got.getOrElse(i.toLong, Array.empty).count(_ <= kd * 1.0005).toDouble / K
        }
        val worst = recalls.min
        val probes = res.stats.map(_.nprobeUsed)
        val log = res.stats.map(s =>
          s"${s.qid} ${s.nprobeUsed} ${s.predictedRecall}").mkString("\n")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/graft_probes_k${K}_e$eps.log"), log)
        println(f"build=${tBuild}%.1fs profile=${tProfile}%.1fs search=${tSearch}%.1fs")
        println(f"worst-case recall = $worst%.3f vs bound ${1 - eps}")
        println(f"mean nprobe = ${probes.sum.toDouble / probes.size}%.1f of $NLIST")
        if (worst >= 1 - eps) println("Error bound is guaranteed")
        else println("ERROR BOUND VIOLATED")

      case "effect" =>
        val reqs = evalQ.indices.map(i => (0.1 + 0.1 * (i % 9)).toFloat)
        val qdf = evalQ.zipWithIndex
          .map { case (v, i) => (i.toLong, v, reqs(i)) }
          .toSeq.toDF("qid", "vec", "required_recall")
        val res = BoundedSearch.search(assigned, model, traces, qdf, K, MULT, STDM)
        val got = res.results.select(col("qid"), col("dist"))
          .as[(Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val rows = evalQ.zipWithIndex.map { case (q, i) =>
          val kd = kth(q)
          val ach = got.getOrElse(i.toLong, Array.empty).count(_ <= kd * 1.0005).toDouble / K
          (reqs(i), ach)
        }
        rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (r, xs) =>
          val achieved = xs.map(_._2)
          println(f"required $r%.1f → achieved mean ${achieved.sum / achieved.size}%.3f min ${achieved.min}%.3f (${xs.size} queries)")
        }
        val ok = rows.count { case (r, a) => a >= r }
        println(s"met requirement: $ok/${rows.size}")

      case "overhead" =>
        val qdf = evalQ.zipWithIndex
          .map { case (v, i) => (i.toLong, v, 0.8f) }
          .toSeq.toDF("qid", "vec", "required_recall")
        val t2 = now()
        val res = BoundedSearch.search(assigned, model, traces, qdf, K, MULT, STDM)
        res.results.count()
        val tElp = now() - t2
        val meanProbe = res.stats.map(_.nprobeUsed).sum / res.stats.size
        val t3 = now()
        IVFSearch.search(assigned, model, qdf.select(col("qid"), col("vec")),
          K, meanProbe).count()
        val tFixed = now() - t3
        println(f"ELP search: $tElp%.2fs; fixed nprobe=$meanProbe scan: $tFixed%.2fs; overhead ratio ${tElp / tFixed}%.2f")
    }
    spark.stop()
  }

  private def now(): Double = System.nanoTime() / 1e9
}
