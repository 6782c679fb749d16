package graft

import org.apache.spark.sql.functions._
import graft.index.IVFIndex
import graft.profile.ProfileTrainer
import graft.search.{BoundedSearch, FlatSearch}

/** End-to-end Auncel-semantics acceptance: train the error profile on
  * seeded data, run bounded-error search, and check the reference's own
  * success criterion — worst-case distance-threshold recall ≥ required
  * (`Auncel/eval/bound.cpp:400-414`). */
class BoundedSearchSpec extends SparkSpec {

  val d = 24
  val k = 20
  val nlist = 64 // nlist/8 = 8 → trace levels {1,2,4,8}

  // clustered data — the structure IVF (and the error profile) exploits;
  // uniform random vectors would legitimately force every query to the cap
  lazy val pool = clusteredVecs(4210, d, nClusters = 48, seed = 21)
  lazy val base = pool.take(4000)
  lazy val baseDF = vecDF(base)
  lazy val model = IVFIndex.train(baseDF, nlist, metric = "l2", seed = 42L)
  lazy val assigned = IVFIndex.assign(baseDF, model).cache()

  lazy val trainQ = pool.slice(4000, 4150)
  lazy val evalQ = pool.slice(4150, 4210)

  lazy val traces = {
    val tq = vecDF(trainQ, "qid")
    val gt = FlatSearch.knn(baseDF, tq, k)
    ProfileTrainer.train(assigned, model, tq, gt, maxTopk = k, bs = 100)
  }

  /** Distance-threshold recall@k (the reference's `true_recall`:
    * returned dist ≤ GT k-th dist × 1.0005). */
  def achievedRecall(results: Map[Long, Array[Double]],
                     gtKth: Map[Long, Double]): Map[Long, Double] =
    results.map { case (qid, dists) =>
      (qid, dists.count(_ <= gtKth(qid) * 1.0005).toDouble / k)
    }

  test("stagedTopK chunked query batches produce identical capture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tq = vecDF(trainQ.take(20), "qid")
    def capture(chunk: Int) =
      ProfileTrainer.stagedTopK(assigned, model, tq, maxTopk = k, chunkQueries = chunk)
        .select(col("qid").cast("long"), col("stage"), col("dists"))
        .as[(Long, Int, Array[Double])].collect()
        .map { case (q, s, ds) => (q, s, ds.toSeq) }.sortBy(x => (x._1, x._2))
    val whole = capture(1000)
    val chunked = capture(7) // forces 3 chunks
    assert(whole.sameElements(chunked))
  }

  test("traces are trained, monotone-indexed, and non-trivial") {
    assert(traces.length == 4)
    traces.zipWithIndex.foreach { case (t, j) =>
      assert(t.nprobe == (1 << j))
      assert(t.phis.nonEmpty, s"level $j has no points")
      assert(t.phis.sameElements(t.phis.sorted), s"level $j φ not ascending")
      // U ≥ 1: a result's GT rank can only be ≥ its current rank
      assert(t.us.forall(_ >= 1f - 1e-6f), s"level $j U<1")
    }
    // deeper probes → smaller rank inflation at comparable φ
    assert(traces.last.us.head <= traces.head.us.last + 1e-3)
  }

  test("bounded search meets the error bound for every query (ε=0.2)") {
    import spark.implicits._
    val require = 0.8f
    val qdf = evalQ.zipWithIndex.map { case (v, i) => (i.toLong, v, require) }
      .toSeq.toDF("qid", "vec", "required_recall")
    val res = BoundedSearch.search(assigned, model, traces, qdf, k,
      multiplier = 8.0f, stdM = 1.5f)

    val got = res.results.select(col("qid"), col("dist"))
      .as[(Long, Double)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val gtKth = evalQ.zipWithIndex.map { case (q, i) =>
      (i.toLong, bruteForce(base, q, k).last._1)
    }.toMap

    val rec = achievedRecall(got, gtKth)
    val worst = rec.values.min
    assert(worst >= require, s"worst-case recall $worst < $require")

    // and it is actually adaptive: not every query paid the max probes
    val probes = res.stats.map(_.nprobeUsed)
    assert(probes.max <= nlist)
    assert(probes.distinct.size > 1, s"no per-query adaptivity: $probes")
    val meanProbes = probes.sum.toDouble / probes.size
    assert(meanProbes < nlist, s"mean nprobe $meanProbes not below full scan")
  }

  test("bound sweep: eps in {0.1, 0.3} and k=10 all hold (run.sh-style)") {
    import spark.implicits._
    // same-k sweep over the trained traces (ε variations)
    for (require <- Seq(0.9f, 0.7f)) {
      val qdf = evalQ.take(30).zipWithIndex
        .map { case (v, i) => (i.toLong, v, require) }
        .toSeq.toDF("qid", "vec", "required_recall")
      val res = BoundedSearch.search(assigned, model, traces, qdf, k,
        multiplier = 8.0f, stdM = 1.5f)
      val got = res.results.select(col("qid"), col("dist"))
        .as[(Long, Double)].collect().groupBy(_._1).view
        .mapValues(_.map(_._2)).toMap
      val worst = evalQ.take(30).zipWithIndex.map { case (q, i) =>
        val kth = bruteForce(base, q, k).last._1
        got.getOrElse(i.toLong, Array.empty).count(_ <= kth * 1.0005).toDouble / k
      }.min
      assert(worst >= require, s"eps=${1 - require}: worst $worst < $require")
    }
    // different k needs its own traces (the map granularity is per-k)
    val k10 = 10
    val gt10 = FlatSearch.knn(baseDF, vecDF(trainQ, "qid"), k10)
    val traces10 = ProfileTrainer.train(assigned, model, vecDF(trainQ, "qid"),
      gt10, maxTopk = k10, bs = 100)
    val qdf10 = evalQ.take(30).zipWithIndex
      .map { case (v, i) => (i.toLong, v, 0.8f) }
      .toSeq.toDF("qid", "vec", "required_recall")
    val res10 = BoundedSearch.search(assigned, model, traces10, qdf10, k10,
      multiplier = 8.0f, stdM = 1.5f)
    val got10 = res10.results.select(col("qid"), col("dist"))
      .as[(Long, Double)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val worst10 = evalQ.take(30).zipWithIndex.map { case (q, i) =>
      val kth = bruteForce(base, q, k10).last._1
      got10.getOrElse(i.toLong, Array.empty).count(_ <= kth * 1.0005).toDouble / k10
    }.min
    assert(worst10 >= 0.8, s"k=10 worst $worst10 < 0.8")
  }

  test("higher required recall costs more probes") {
    import spark.implicits._
    def meanProbes(require: Float): Double = {
      val qdf = evalQ.take(30).zipWithIndex
        .map { case (v, i) => (i.toLong, v, require) }
        .toSeq.toDF("qid", "vec", "required_recall")
      val res = BoundedSearch.search(assigned, model, traces, qdf, k,
        multiplier = 8.0f, stdM = 1.5f)
      res.stats.map(_.nprobeUsed).sum.toDouble / res.stats.size
    }
    val lo = meanProbes(0.3f)
    val hi = meanProbes(0.9f)
    assert(lo <= hi, s"probes(0.3)=$lo > probes(0.9)=$hi")
  }

  test("bounded search under the inner-product metric (angle-space profile)") {
    import spark.implicits._
    import graft.functions.Kernels
    // normalized vectors: IP ranking ≡ cosine; profile runs in arccos space
    val ipBase = base.map(Kernels.l2Normalize)
    val ipDF = vecDF(ipBase)
    val ipModel = IVFIndex.train(ipDF, nlist, metric = "ip", seed = 42L)
    val ipAssigned = IVFIndex.assign(ipDF, ipModel).cache()
    val ipTrainQ = trainQ.map(Kernels.l2Normalize)
    val ipEvalQ = evalQ.take(30).map(Kernels.l2Normalize)
    val tq = vecDF(ipTrainQ, "qid")
    val gt = FlatSearch.knn(ipDF, tq, k, metric = "ip")
    val ipTraces = ProfileTrainer.train(ipAssigned, ipModel, tq, gt, maxTopk = k, bs = 100)
    assert(ipTraces.forall(_.phis.nonEmpty), "IP traces empty")

    val require = 0.7f
    val qdf = ipEvalQ.zipWithIndex.map { case (v, i) => (i.toLong, v, require) }
      .toSeq.toDF("qid", "vec", "required_recall")
    val res = BoundedSearch.search(ipAssigned, ipModel, ipTraces, qdf, k,
      multiplier = 8.0f, stdM = 1.5f)
    val got = res.results.select(col("qid"), col("dist"))
      .as[(Long, Double)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    // distance-threshold recall in IP space: dot ≥ GT k-th dot × 0.9995
    // (`IndexIVF.cpp:565-567`)
    val rec = ipEvalQ.zipWithIndex.map { case (q, i) =>
      val kthDot = -bruteForce(ipBase, q, k, metric = "ip").last._1
      got.getOrElse(i.toLong, Array.empty).count(d => -d >= kthDot * 0.9995)
        .toDouble / k
    }
    assert(rec.min >= require, s"IP worst-case recall ${rec.min} < $require")
    assert(res.stats.map(_.nprobeUsed).max <= nlist)
  }

  test("traces persist and reload as a parquet model table") {
    val dir = java.nio.file.Files.createTempDirectory("traces").toString
    ProfileTrainer.saveTraces(traces, s"$dir/t", spark)
    val back = ProfileTrainer.loadTraces(s"$dir/t", spark)
    // empty level round-trips without shifting the level alignment
    import graft.profile.ErrorProfile.Trace
    val withEmpty = traces.updated(1, Trace(2, Array.empty, Array.empty, Array.empty))
    ProfileTrainer.saveTraces(withEmpty, s"$dir/t2", spark)
    val back2 = ProfileTrainer.loadTraces(s"$dir/t2", spark)
    assert(back2.length == withEmpty.length)
    assert(back2(1).phis.isEmpty && back2(2).nprobe == 4)
    assert(back.length == traces.length)
    traces.zip(back).foreach { case (a, b) =>
      assert(a.nprobe == b.nprobe)
      assert(a.phis.sameElements(b.phis))
      assert(a.us.sameElements(b.us))
      assert(a.stds.sameElements(b.stds))
      // lookups identical through the round-trip
      assert(a.search(a.phis.last / 2, 1.0f) == b.search(a.phis.last / 2, 1.0f))
    }
  }

  test("eager staged path is bit-identical to the lazy rounds path") {
    import spark.implicits._
    // nlist=32 → levels 3 → eager by default; forceLazy reruns the
    // per-round controller for comparison
    val b = clusteredVecs(2000, d, nClusters = 24, seed = 55)
    val bDF = vecDF(b)
    val m32 = IVFIndex.train(bDF, nlist = 32, seed = 42L)
    val a32 = IVFIndex.assign(bDF, m32).cache()
    val tq = vecDF(clusteredVecs(2100, d, nClusters = 24, seed = 55).drop(2000), "qid")
    val gt32 = FlatSearch.knn(bDF, tq, k)
    val tr32 = ProfileTrainer.train(a32, m32, tq, gt32, maxTopk = k, bs = 50)
    val qdf = clusteredVecs(2130, d, nClusters = 24, seed = 55).drop(2100)
      .zipWithIndex.map { case (v, i) => (i.toLong, v, 0.8f) }
      .toSeq.toDF("qid", "vec", "required_recall")
    val eager = BoundedSearch.search(a32, m32, tr32, qdf, k,
      multiplier = 4.0f, stdM = 1.0f)
    val lazyR = BoundedSearch.search(a32, m32, tr32, qdf, k,
      multiplier = 4.0f, stdM = 1.0f, forceLazy = true)
    val eRows = eager.results.select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val lRows = lazyR.results.select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(eRows.sameElements(lRows))
    assert(eager.stats == lazyR.stats)
  }

  test("deep-schedule driver-decided path is bit-identical to the lazy rounds path") {
    import spark.implicits._
    // nlist=256 → levels 6 → the searchStagedDriver route (one action
    // per round, driver-side decisions); forceLazy reruns the cached-
    // ctrl per-round controller on the identical inputs. Both must
    // agree on rows AND stats for every query — the decisions share
    // rankings, boundary windows, predictedRecall, and decideStep by
    // construction, and this pins the plumbing around them.
    val b = clusteredVecs(5120, d, nClusters = 48, seed = 91)
    val bDF = vecDF(b)
    val m256 = IVFIndex.train(bDF, nlist = 256, seed = 42L)
    val a256 = IVFIndex.assign(bDF, m256).cache()
    val tq = vecDF(clusteredVecs(5270, d, nClusters = 48, seed = 91).drop(5120), "qid")
    val gt = FlatSearch.knn(bDF, tq, k)
    val tr = ProfileTrainer.train(a256, m256, tq, gt, maxTopk = k, bs = 50)
    assert(tr.length > 4, "config must exercise the deep (levels > 4) route")
    val qdf = clusteredVecs(5310, d, nClusters = 48, seed = 91).drop(5270)
      .zipWithIndex.map { case (v, i) => (i.toLong, v, 0.8f) }
      .toSeq.toDF("qid", "vec", "required_recall")
    def run(forceLazy: Boolean) = {
      val r = BoundedSearch.search(a256, m256, tr, qdf, k,
        multiplier = 4.0f, stdM = 1.0f, forceLazy = forceLazy)
      (r.results.select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect().sortBy(x => (x._1, x._2)),
        r.stats.sortBy(_.qid))
    }
    val (hRows, hStats) = run(forceLazy = false)
    val (lRows, lStats) = run(forceLazy = true)
    assert(hRows.sameElements(lRows),
      "driver-decided rows differ from lazy rows")
    assert(hStats == lStats, "driver-decided stats differ from lazy stats")
  }

  test("fully-distributed (cogroup) path is bit-identical to lazy and eager") {
    import spark.implicits._
    val b = clusteredVecs(2000, d, nClusters = 24, seed = 55)
    val bDF = vecDF(b)
    val m32 = IVFIndex.train(bDF, nlist = 32, seed = 42L)
    val a32 = IVFIndex.assign(bDF, m32).cache()
    val tq = vecDF(clusteredVecs(2100, d, nClusters = 24, seed = 55).drop(2000), "qid")
    val gt32 = FlatSearch.knn(bDF, tq, k)
    val tr32 = ProfileTrainer.train(a32, m32, tq, gt32, maxTopk = k, bs = 50)
    val qdf = clusteredVecs(2130, d, nClusters = 24, seed = 55).drop(2100)
      .zipWithIndex.map { case (v, i) => (i.toLong, v, 0.8f) }
      .toSeq.toDF("qid", "vec", "required_recall")
    def run(force: (Boolean, Boolean)) = {
      val r = BoundedSearch.search(a32, m32, tr32, qdf, k,
        multiplier = 4.0f, stdM = 1.0f, forceLazy = force._1,
        forceDistributed = force._2)
      (r.results.select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect().sortBy(x => (x._1, x._2)),
        r.stats.sortBy(_.qid))
    }
    val (eRows, eStats) = run((false, false))
    val (dRows, dStats) = run((false, true))
    assert(eRows.sameElements(dRows),
      "distributed rows differ from eager rows")
    assert(eStats == dStats, "distributed stats differ from eager stats")
    val (lRows, lStats) = run((true, false))
    assert(lRows.sameElements(dRows))
    assert(lStats == dStats)
  }

  test("cogroup path salts hot lists and stays bit-identical under skew") {
    import spark.implicits._
    // all queries jittered around ONE base point → the same few lists
    // take every probe row; maxProbes=4 forces multi-salt sub-keys on
    // those hot lists, exercising the data-replication + probe-split
    // path that guards a task's memory at 100k+ queries
    val b = clusteredVecs(2000, d, nClusters = 24, seed = 55)
    val bDF = vecDF(b)
    val m32 = IVFIndex.train(bDF, nlist = 32, seed = 42L)
    val a32 = IVFIndex.assign(bDF, m32).cache()
    val tq = vecDF(clusteredVecs(2100, d, nClusters = 24, seed = 55).drop(2000), "qid")
    val gt32 = FlatSearch.knn(bDF, tq, k)
    val tr32 = ProfileTrainer.train(a32, m32, tq, gt32, maxTopk = k, bs = 50)
    val rnd = new scala.util.Random(91)
    val anchor = b(17)
    val skewQ = Array.fill(30)(
      anchor.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
    val qdf = skewQ.zipWithIndex.map { case (v, i) => (i.toLong, v, 0.8f) }
      .toSeq.toDF("qid", "vec", "required_recall")
    def run(salted: Boolean, distributed: Boolean) = {
      if (salted) sys.props("graft.cogroup.maxProbes") = "4"
      try {
        val r = BoundedSearch.search(a32, m32, tr32, qdf, k,
          multiplier = 4.0f, stdM = 1.0f, forceDistributed = distributed)
        (r.results.select(col("qid"), col("rank"), col("id"), col("dist"))
          .as[(Long, Int, Long, Double)].collect().sortBy(x => (x._1, x._2)),
          r.stats.sortBy(_.qid))
      } finally if (salted) sys.props.remove("graft.cogroup.maxProbes")
    }
    val (eRows, eStats) = run(salted = false, distributed = false)
    val (sRows, sStats) = run(salted = true, distributed = true)
    assert(eRows.sameElements(sRows), "salted cogroup rows differ from eager")
    assert(eStats == sStats, "salted cogroup stats differ from eager")
  }

  test("large query batches route to the distributed-state path and match chunked eager") {
    import spark.implicits._
    // nq > EagerMaxQueries forces the lazy path even at levels ≤ 3;
    // per-query decisions are independent, so running the same queries
    // through the eager path in small chunks must give identical rows
    // and stats — proving the distributed control state changes nothing.
    val b = clusteredVecs(1500, d, nClusters = 24, seed = 77)
    val bDF = vecDF(b)
    val m32 = IVFIndex.train(bDF, nlist = 32, seed = 42L)
    val a32 = IVFIndex.assign(bDF, m32).cache()
    val tq = vecDF(clusteredVecs(1600, d, nClusters = 24, seed = 77).drop(1500), "qid")
    val gt32 = FlatSearch.knn(bDF, tq, k = 10)
    val tr32 = ProfileTrainer.train(a32, m32, tq, gt32, maxTopk = 10, bs = 50)
    val nq = 4400
    val qvecs = clusteredVecs(nq, d, nClusters = 24, seed = 78)
    val qdf = qvecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0.8f) }
      .toSeq.toDF("qid", "vec", "required_recall")
    // the default cap moved to 32768 (r12 A/B) — pin it below nq here
    // so this test still proves the nq-over-cap ROUTING takes the lazy
    // path (not forceLazy, which would bypass the router under test)
    System.setProperty("graft.eager.maxQueries", "4096")
    val lazyR =
      try BoundedSearch.search(a32, m32, tr32, qdf, k = 10,
        multiplier = 4.0f, stdM = 1.0f)
      finally System.clearProperty("graft.eager.maxQueries")
    val lazyRows = lazyR.results
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(lazyR.stats.size == nq)
    assert(lazyRows.map(_._1).distinct.length == nq, "some query lost its rows")

    val chunks = qvecs.zipWithIndex.grouped(2200).toSeq
    val eager = chunks.map { ch =>
      val cdf = ch.map { case (v, i) => (i.toLong, v, 0.8f) }
        .toSeq.toDF("qid", "vec", "required_recall")
      val r = BoundedSearch.search(a32, m32, tr32, cdf, k = 10,
        multiplier = 4.0f, stdM = 1.0f)
      val rows = r.results.select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect()
      (rows, r.stats)
    }
    val eagerRows = eager.flatMap(_._1.toSeq).toArray.sortBy(r => (r._1, r._2))
    val eagerStats = eager.flatMap(_._2).sortBy(_.qid)
    assert(lazyRows.sameElements(eagerRows))
    assert(lazyR.stats.sortBy(_.qid) == eagerStats)
  }

  test("latency-bounded search respects the probe budget") {
    import spark.implicits._
    val qdf = evalQ.take(10).zipWithIndex
      .map { case (v, i) => (i.toLong, v, 8.0) } // 8ms budget
      .toSeq.toDF("qid", "vec", "budget_ms")
    val res = BoundedSearch.timeSearch(assigned, model, qdf, k,
      costPerProbeMs = 1.0)
    assert(res.stats.forall(_.nprobeUsed <= 8))
    assert(res.results.count() > 0)
  }
}
