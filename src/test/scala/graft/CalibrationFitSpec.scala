package graft

import org.apache.spark.sql.functions._
import graft.index.IVFIndex
import graft.profile.{CalibrationFit, ProfileTrainer}
import graft.search.{BoundedSearch, FlatSearch}

/** The calibration-fitting job (VERDICT r9 #3): given an index, traces
  * and a held-out query set with exact GT, the fitter must return a
  * (multiplier, std_m) pair that HOLDS the bound on the holdout where
  * the uncalibrated raw prediction fails it — the reference's
  * acceptance rule (`eval/bound.cpp:400-414`) applied at fitting time
  * instead of the hand-tuned `hyperparameter.txt` constants. */
class CalibrationFitSpec extends SparkSpec {

  val d = 24
  val k = 20
  val nlist = 64
  val required = 0.9f

  lazy val pool = clusteredVecs(4300, d, nClusters = 48, seed = 33)
  lazy val base = pool.take(4000)
  lazy val baseDF = vecDF(base)
  lazy val model = IVFIndex.train(baseDF, nlist, metric = "l2", seed = 42L)
  lazy val assigned = IVFIndex.assign(baseDF, model).cache()

  lazy val traces = {
    val tq = vecDF(pool.slice(4000, 4150), "qid")
    val gt = FlatSearch.knn(baseDF, tq, k)
    ProfileTrainer.train(assigned, model, tq, gt, maxTopk = k, bs = 100)
  }

  // holdout: disjoint from profile training
  lazy val holdQ = vecDF(pool.slice(4150, 4250), "qid")
  lazy val holdGt = FlatSearch.knn(baseDF, holdQ, k).cache()

  lazy val fit = CalibrationFit.fit(assigned, model, traces, holdQ, holdGt,
    k, required, multipliers = Seq(1f, 4f, 8f, 16f), stdMs = Seq(0f, 1.5f))

  test("uncalibrated raw prediction breaks the bound the fitter must close") {
    // (1, 0) — the figure-16 cal_no arm — is in the swept grid; the
    // test corpus is chosen so it genuinely fails, otherwise the fit
    // result would be vacuous
    val raw = fit.swept.find(c => c.multiplier == 1f && c.stdM == 0f).get
    assert(raw.minRecall < required,
      f"expected the uncalibrated cell to break the bound, got ${raw.minRecall}%.3f")
  }

  test("fitted pair holds the bound on the holdout") {
    assert(fit.met, s"no grid cell met the bound: ${fit.swept}")
    assert(fit.minRecall >= required)
    // and it is the cheapest passing cell, not just any passing cell
    val passing = fit.swept.filter(_.minRecall >= required)
    assert(fit.meanNprobe == passing.map(_.meanNprobe).min)
  }

  test("fitted pair generalizes to unseen queries from the same workload") {
    import spark.implicits._
    val evalQ = vecDF(pool.slice(4250, 4300), "qid")
    val gtKth = FlatSearch.knn(baseDF, evalQ, k)
      .filter(col("rank") === k)
      .select(col("qid").cast("long"), col("dist"))
      .as[(Long, Double)].collect().toMap
    val r = BoundedSearch.search(assigned, model, traces,
      evalQ.withColumn("required_recall", lit(required)), k,
      multiplier = fit.multiplier, stdM = fit.stdM)
    val got = r.results.select(col("qid"), col("dist"))
      .as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val recs = gtKth.map { case (qid, kd) =>
      got.getOrElse(qid, Array.empty).count(_ <= kd * 1.0005).toDouble / k
    }
    assert(recs.min >= required,
      f"fitted calibration broke the bound on unseen queries: ${recs.min}%.3f")
  }
}
