package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.profile.ErrorProfile.Trace
import graft.search.BoundedSearch

/** O14b — per-workload calibration FITTING: the job the reference's
  * committed constants imply but never ship. `Auncel/hyperparameter.txt:
  * 1-12` stores one hand-tuned (multiplier, std_m) pair per experiment,
  * loaded by `setparam` (`IVF_pro.cpp:240-256`) and judged by the
  * worst-case acceptance rule (`eval/bound.cpp:386-414`: min over eval
  * queries of distance-threshold recall ≥ 1−ε). Nothing in the
  * reference can PRODUCE a pair for a new workload — a user of a fresh
  * dataset inherits a figure's constants and hopes.
  *
  * This job closes that gap: given an index, its trained traces, and a
  * held-out query set with exact ground truth, sweep a (multiplier,
  * std_m) grid through [[BoundedSearch]] and return the CHEAPEST pair
  * (by mean probes actually spent) whose worst-case holdout recall
  * meets the bound — the reference's own acceptance rule, applied at
  * fitting time instead of paper-writing time.
  *
  * Scale shape: the holdout is small by construction (hundreds of
  * queries — the reference fits with 5000, `eval/run.sh`); each grid
  * cell is one BoundedSearch batch over it, and the ground-truth scan
  * is one flat k-NN pass. Nothing here grows with the corpus beyond
  * those per-cell searches.
  */
object CalibrationFit {

  /** One swept grid cell: worst/mean holdout recall and the mean probe
    * count the pair actually spent. */
  final case class Candidate(multiplier: Float, stdM: Float,
                             minRecall: Double, meanRecall: Double,
                             meanNprobe: Double)

  /** @param met      whether any grid cell held the bound; when false,
    *                 (multiplier, stdM) is the best-recall cell and the
    *                 caller should widen the grid
    * @param swept    every evaluated cell, for reporting */
  final case class Fit(multiplier: Float, stdM: Float, minRecall: Double,
                       meanNprobe: Double, met: Boolean,
                       swept: Seq[Candidate])

  /** Worst-case acceptance recall — shared with the figure-10 compare
    * harness ([[graft.CompareMetrics.thresholdRecall]]). */
  private def thresholdRecall(got: Map[Long, Array[Double]],
                              kth: Map[Long, Double], k: Int): Map[Long, Double] =
    graft.CompareMetrics.thresholdRecall(got, kth, k)

  /** Sweep the grid and return the cheapest bound-holding pair.
    *
    * @param holdout (qid, vec) — held out from BOTH profile training
    *                and the serving workload
    * @param gt      exact k-NN of the holdout ([[graft.search.FlatSearch.knn]]
    *                output: qid, id, dist, rank)
    * @param requiredRecall the bound (1−ε) the pair must guarantee
    */
  def fit(ivfData: DataFrame, model: graft.index.IVFModel,
          traces: Array[Trace], holdout: DataFrame, gt: DataFrame,
          k: Int, requiredRecall: Float,
          multipliers: Seq[Float] = Seq(1f, 2f, 4f, 8f, 16f),
          stdMs: Seq[Float] = Seq(0f, 1f, 2f)): Fit = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val kth: Map[Long, Double] = gt
      .filter(col("rank") === k)
      .select(col("qid").cast("long"), col("dist"))
      .as[(Long, Double)].collect().toMap
    val qdf = holdout
      .select(col("qid"), col("vec"), lit(requiredRecall).as("required_recall"))
      .cache()
    qdf.count()
    try {
      val swept = for (m <- multipliers; s <- stdMs) yield {
        val r = BoundedSearch.search(ivfData, model, traces, qdf, k,
          multiplier = m, stdM = s)
        val got = r.results.select(col("qid"), col("dist"))
          .as[(Long, Double)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val recs = thresholdRecall(got, kth, k).values.toSeq
        Candidate(m, s, recs.min, recs.sum / recs.size,
          r.stats.map(_.nprobeUsed).sum.toDouble / r.stats.size)
      }
      val passing = swept.filter(_.minRecall >= requiredRecall)
      if (passing.nonEmpty) {
        // cheapest by probes actually spent; ties to the tamer pair
        val best = passing.minBy(c => (c.meanNprobe, c.multiplier, c.stdM))
        Fit(best.multiplier, best.stdM, best.minRecall, best.meanNprobe,
          met = true, swept)
      } else {
        val best = swept.maxBy(c => (c.minRecall, -c.meanNprobe))
        Fit(best.multiplier, best.stdM, best.minRecall, best.meanNprobe,
          met = false, swept)
      }
    } finally { qdf.unpersist(); () }
  }
}
