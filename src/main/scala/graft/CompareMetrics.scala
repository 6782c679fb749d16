package graft

/** Metric math for the figure-10 three-way comparison twin
  * (`figures/overall/figure10-1.py:36-82` + the LAET budget anchors in
  * `LAET/benchs/learned_termination/run.sh:5-21`): pure functions so
  * CompareMetricsSpec can pin each number the harness prints.
  *
  * The reference's figure reads one per-query latency per line from
  * each engine's `*_Latency_*.log` and reports (a) the mean latency per
  * engine and (b) the mean over queries of the per-query slowdown
  * ratio engine[j]/auncel[j]. This twin executes micro-batches (honest
  * Spark semantics), so "per-query latency" is amortized within a
  * batch; the ratio math is unchanged.
  */
object CompareMetrics {

  /** Mean of per-query (or per-batch-amortized) latencies, ms. */
  def meanMs(latSec: Seq[Double]): Double =
    if (latSec.isEmpty) 0.0 else latSec.sum * 1000.0 / latSec.size

  /** figure10-1.py:74-79 — mean over positions j of other[j]/base[j].
    * Both sequences must cover the same query order. */
  def slowdownVs(base: Seq[Double], other: Seq[Double]): Double = {
    require(base.length == other.length && base.nonEmpty,
      s"latency logs differ in length: ${base.length} vs ${other.length}")
    other.lazyZip(base).map(_ / _).sum / base.length
  }

  /** Tail-latency dispersion p99/mean (nearest-rank p99, the ScaleDemo
    * percentile convention: sorted index round(p·(n−1))). */
  def tailRatio(latSec: Seq[Double]): Double = {
    if (latSec.isEmpty) return 0.0
    val s = latSec.sorted
    val p99 = s((0.99 * (s.length - 1)).round.toInt)
    p99 / (latSec.sum / latSec.size)
  }

  /** Probe budget in the LAET anchor's unit (`run.sh:3` "multipler =
    * nprobe/100": the committed nprobe param is 100× the per-query mean
    * over its 10k eval queries — sift10M k=100 err=10 ⇒ 7530 ⇒ mean
    * 75.3 lists/query on IVF1024). Returned as (total, mean, fraction
    * of nlist) so corpora of any nlist compare on the fraction. */
  def probeBudget(nprobes: Seq[Int], nlist: Int): (Long, Double, Double) = {
    val total = nprobes.foldLeft(0L)(_ + _)
    val mean = if (nprobes.isEmpty) 0.0 else total.toDouble / nprobes.size
    (total, mean, mean / nlist)
  }

  /** Worst-case acceptance recall (`eval/bound.cpp:400-414`): fraction
    * of a query's returned distances within the exact k-th distance
    * (small tolerance for float noise, direction-aware so it stays a
    * RELAXATION for the negated-IP convention too). The multiplicative
    * term alone collapses to zero tolerance at kd = 0 (duplicate /
    * identical vectors); the reference's inter_sec (bound.cpp:117-126)
    * uses an additive ±1e-6 that still relaxes there, so the additive
    * floor is kept alongside the relative term. */
  def thresholdRecall(got: Map[Long, Array[Double]],
                      kth: Map[Long, Double], k: Int): Map[Long, Double] =
    kth.map { case (qid, kd) =>
      val rel = if (kd >= 0) kd * 1.0005 else kd * 0.9995
      val tol = math.max(rel, kd + 1e-6)
      qid -> got.getOrElse(qid, Array.empty).count(_ <= tol).toDouble / k
    }

  /** Per-engine verdict recall: the worst over BOTH measured tables —
    * the micro-batch summary (≤200 queries) and the full-batch run
    * over the entire eval set. A tail query that breaks the bound only
    * in the full batch must flip the closing HELD/BROKE verdict; an
    * engine missing from the full table (not run there) is judged on
    * its micro-batch worst alone. */
  def verdictWorst(micro: Map[String, Double],
                   full: Map[String, Double]): Map[String, Double] =
    // union of both tables' engines: an engine measured in only one
    // table is judged on that table alone; one measured in both takes
    // the worse reading. (Eval currently feeds the same engine set to
    // both, but the contract must not silently drop a full-only row.)
    (micro.keySet ++ full.keySet).iterator.map { name =>
      name -> math.min(
        micro.getOrElse(name, Double.MaxValue),
        full.getOrElse(name, Double.MaxValue))
    }.toMap
}
