package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.IVFModel
import graft.search.{FlatSearch, IVFSearch}

/** Offline parameter sweep (`Auncel/AutoTune.h:86-204` ParameterSpace):
  * enumerate nprobe operating points, measure (cost, recall) on a sample
  * query set against exact ground truth, keep the Pareto front.
  *
  * The recall criterion is the bounded-case (worst-case) one of the
  * reference's modified faiss baseline — min over queries instead of
  * mean (`faiss/AutoTune.cpp:88-101`) — with the forced fallback point
  * `nprobe = nlist` (`faiss/AutoTune.cpp:630-634`).
  */
object AutoTune {

  final case class OperatingPoint(nprobe: Int, meanRecall: Double,
                                  minRecall: Double, cost: Double)

  /** Sweep power-of-2 nprobe values (plus nlist). Cost model: fraction
    * of lists probed (∝ bytes scanned at scale).
    *
    * @param stopAtMinRecall when set, the sweep ends at the first point
    *   whose worst-case recall reaches the target. Id-set recall is
    *   MONOTONE in nprobe (a larger probe set's top-k comes from a
    *   superset of candidates), so that point is also the cheapest
    *   passing one — large-corpus sweeps skip the expensive deep points
    *   they'd never select.
    * @param precomputedExact exact id sets already in hand (e.g. a GT
    *   table computed for profile training) — passing them skips the
    *   sweep's own full-corpus exact k-NN scan, the most expensive job
    *   here at 10M+ */
  def sweep(ivfData: DataFrame, model: IVFModel, queries: DataFrame,
            k: Int, stopAtMinRecall: Option[Double] = None,
            precomputedExact: Option[Map[Long, Set[Long]]] = None): Seq[OperatingPoint] = {
    import ivfData.sparkSession.implicits._
    val exact = precomputedExact.getOrElse(
      exactIdSets(ivfData.select(col("id"), col("vec")), queries, k))
    val points = Iterator.iterate(1)(_ * 2).takeWhile(_ < model.nlist).toSeq :+ model.nlist
    val out = Vector.newBuilder[OperatingPoint]
    var done = false
    points.foreach { np =>
      if (!done) {
        val got = IVFSearch.search(ivfData, model, queries, k, np)
          .select(col("qid"), col("id")).as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val recalls = exact.map { case (q, ids) =>
          (got.getOrElse(q, Set.empty) & ids).size.toDouble / k
        }.toSeq
        out += OperatingPoint(np, recalls.sum / recalls.size, recalls.min,
          np.toDouble / model.nlist)
        if (stopAtMinRecall.exists(recalls.min >= _)) done = true
      }
    }
    out.result()
  }

  /** Pareto front: drop points dominated in (cost ↓, recall ↑).
    * Equal-cost points sort best-recall first so a dominated twin at
    * the same cost can never enter the front. */
  def paretoFront(points: Seq[OperatingPoint],
                  byMin: Boolean = true): Seq[OperatingPoint] = {
    def r(p: OperatingPoint) = if (byMin) p.minRecall else p.meanRecall
    points.sortBy(p => (p.cost, -r(p))).foldLeft(Vector.empty[OperatingPoint]) { (acc, p) =>
      if (acc.isEmpty || r(p) > r(acc.last) + 1e-12) acc :+ p else acc
    }
  }

  /** Cheapest operating point meeting a worst-case recall target; falls
    * back to nprobe = nlist (which always exists in the sweep). */
  def select(points: Seq[OperatingPoint], minRecallTarget: Double): OperatingPoint =
    points.filter(_.minRecall >= minRecallTarget)
      .minByOption(_.cost)
      .getOrElse(points.maxBy(_.nprobe))

  // ---- multi-parameter sweeps (`Auncel/AutoTune.cpp:353-408`:
  // ParameterSpace enumerates nprobe × k_factor × efSearch × ht, not
  // just nprobe, once refine/graph indexes are operating points) ----

  final case class MultiPoint(params: Map[String, Int], meanRecall: Double,
                              minRecall: Double, cost: Double)

  /** Exact ground-truth id set per query — the yardstick every sweep
    * scores recall against, computed once per sweep the same way. */
  def exactIdSets(baseVecs: DataFrame, queries: DataFrame,
                  k: Int): Map[Long, Set[Long]] = {
    import baseVecs.sparkSession.implicits._
    FlatSearch.knn(baseVecs, queries, k)
      .select(col("qid").cast("long"), col("id").cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  /** Generic grid sweep: run each configuration, score recall vs the
    * exact ids, attach the model cost. */
  def sweepGrid(grid: Seq[Map[String, Int]],
                run: Map[String, Int] => DataFrame,
                exact: Map[Long, Set[Long]], k: Int,
                cost: Map[String, Int] => Double): Seq[MultiPoint] = {
    grid.map { cfg =>
      val res = run(cfg)
      import res.sparkSession.implicits._
      val got = res.select(col("qid").cast("long"), col("id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = exact.map { case (q, ids) =>
        (got.getOrElse(q, Set.empty) & ids).size.toDouble / k
      }.toSeq
      MultiPoint(cfg, recalls.sum / recalls.size, recalls.min, cost(cfg))
    }
  }

  /** nprobe × k_factor sweep for IVFPQ+refine (`k_factor_rf` in the
    * reference space). Cost model: fraction of codes ADC-scanned plus
    * fraction of the collection exactly reranked. */
  def sweepIvfPqRefine(encData: DataFrame, baseVecs: DataFrame,
                       model: graft.index.IVFModel, pq: graft.quantize.PQModel,
                       queries: DataFrame, k: Int,
                       nprobes: Seq[Int], kFactors: Seq[Int],
                       nTotal: Long): Seq[MultiPoint] = {
    val exact = exactIdSets(baseVecs, queries, k)
    val grid = for (np <- nprobes; kf <- kFactors)
      yield Map("nprobe" -> np, "k_factor" -> kf)
    sweepGrid(grid,
      cfg => graft.index.IVFPQ.searchRefine(encData, baseVecs, model, pq,
        queries, k, cfg("nprobe"), cfg("k_factor")),
      exact, k,
      cfg => cfg("nprobe").toDouble / model.nlist +
        cfg("k_factor").toDouble * k / nTotal)
  }

  /** efSearch sweep for a built HNSW graph. Cost model: beam width as
    * a fraction of the block size (∝ nodes visited). */
  def sweepHnswEf(graph: DataFrame, baseVecs: DataFrame, queries: DataFrame,
                  k: Int, efs: Seq[Int], blockSize: Double): Seq[MultiPoint] = {
    val exact = exactIdSets(baseVecs, queries, k)
    sweepGrid(efs.map(e => Map("efSearch" -> e)),
      cfg => graft.index.HNSW.searchGraph(graph, queries, k, cfg("efSearch")),
      exact, k,
      cfg => cfg("efSearch") / blockSize)
  }

  /** ht (polysemous Hamming threshold) sweep — the last of the
    * reference ParameterSpace's axes (`Auncel/AutoTune.cpp:353-408`
    * enumerates `ht` alongside nprobe/k_factor/efSearch). Cost model:
    * the measured Hamming-CDF pass rate — the fraction of stored codes
    * that survive the filter and pay ADC — priced for ALL thresholds
    * from one distributed histogram pass, so the sweep scans the data
    * once for costs plus once per ht for recall. */
  def sweepPolysemousHt(codes: DataFrame, baseVecs: DataFrame,
                        pq: graft.quantize.PQModel, queries: DataFrame,
                        k: Int, hts: Seq[Int]): Seq[MultiPoint] = {
    val exact = exactIdSets(baseVecs, queries, k)
    val hist = graft.quantize.Polysemous.hammingHistogram(codes, pq, queries)
    val total = hist.sum.toDouble
    val cdf = hist.scanLeft(0L)(_ + _).tail // cdf(d) = pairs at distance ≤ d
    def passRate(ht: Int): Double =
      if (total == 0) 0.0 else cdf(math.min(ht, cdf.length - 1)) / total
    sweepGrid(hts.map(h => Map("ht" -> h)),
      cfg => graft.quantize.Polysemous.knn(codes, pq, queries, k, cfg("ht")),
      exact, k,
      cfg => passRate(cfg("ht")))
  }

  /** Pareto front / bounded-case selection over multi-param points —
    * same worst-case criterion as the single-param form. */
  def paretoFrontMulti(points: Seq[MultiPoint],
                       byMin: Boolean = true): Seq[MultiPoint] = {
    def r(p: MultiPoint) = if (byMin) p.minRecall else p.meanRecall
    points.sortBy(p => (p.cost, -r(p))).foldLeft(Vector.empty[MultiPoint]) { (acc, p) =>
      if (acc.isEmpty || r(p) > r(acc.last) + 1e-12) acc :+ p else acc
    }
  }

  def selectMulti(points: Seq[MultiPoint], minRecallTarget: Double): MultiPoint =
    points.filter(_.minRecall >= minRecallTarget)
      .minByOption(_.cost)
      .getOrElse(points.maxBy(_.cost))
}
