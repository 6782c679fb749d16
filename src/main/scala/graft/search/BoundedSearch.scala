package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.index.IVFModel
import graft.operators.TopK
import graft.profile.ErrorProfile
import graft.profile.ErrorProfile.Trace

/** Auncel's core: error-bounded adaptive IVF search
  * (`IndexIVF::search_preassigned` tune block,
  * `Auncel/IndexIVF.cpp:504-637`) re-expressed as a staged-rounds Spark
  * controller (SURVEY §7.2):
  *
  *  - probes run in power-of-2 rounds (1, 2, 4, …, nlist/8), exactly the
  *    stages the traces are trained at;
  *  - after each round, per-query predicted recall = curNum/k from the
  *    geometric error profile (φ over boundary distances → trace lookup
  *    with σ margin);
  *  - a query stops once predicted ≥ required (or the nlist/8 hard cap,
  *    `IndexIVF.cpp:621-626`), then probes out to
  *    `stage × multiplier` lists (the calibration multiplier,
  *    `IndexIVF.cpp:616,623`);
  *  - stagnation rule: if the worst kept distance is unchanged across
  *    `required_recall × 12` consecutive probes, treat recall as 1
  *    (`IndexIVF.cpp:570-598`) — staged form: a round with an unchanged
  *    worst distance counts as that round's probe count.
  *
  * Scale shape: each round reads ONLY the newly probed lists (partition
  * pruning), per-partition bounded heaps shuffle `parts × nq_active × k`
  * rows, and the carried top-k state is a DataFrame of `nq × k` rows —
  * nothing per-vector ever sits on the driver.
  */
object BoundedSearch {

  /** Per-query outcome: the probe count actually used and the profile's
    * predicted recall at decision time. */
  final case class QueryStats(qid: Long, nprobeUsed: Int, predictedRecall: Float,
                              decidedAtStage: Int)

  final case class Result(results: DataFrame, stats: Seq[QueryStats])

  /** Per-query control state for the staged rounds — lives in a
    * DataFrame on the lazy path (one row per query, executor-side;
    * SURVEY §7.4's state-size watch item) and in the [[Decider]]'s
    * O(nq) arrays on the small-batch eager path. */
  /** `topIds`/`topDists` (sorted ascending by (dist, id), defaulted
    * empty) carry the query's running top-k through the LAZY loop's
    * control rows — the same merge-in-control fusion as [[CtrlD]];
    * [[decideStep]] ignores and preserves them (`copy`). */
  final case class Ctrl(qid: Long, require: Float, myNprobe: Int,
                        stoped: Int, preVal: Double, predicted: Float,
                        decidedStage: Int,
                        topIds: Array[Long] = Array.emptyLongArray,
                        topDists: Array[Double] = Array.emptyDoubleArray)

  /** The pure one-round termination transition (`IndexIVF.cpp:504-637`
    * tune block: stagnation bookkeeping + stop decision), shared
    * verbatim by the driver-side Decider and the distributed control
    * DataFrame so both paths produce identical decisions. Callers
    * invoke it only for still-active queries (myNprobe == 0). */
  def decideStep(st: Ctrl, j: Int, levels: Int, k: Int, multiplier: Float,
                 recallRaw: Float, nDists: Int, maxVal: Double): Ctrl = {
    val lo = if (j == 0) 0 else 1 << (j - 1)
    val hi = 1 << j
    var recall = recallRaw
    var stoped = st.stoped
    // stagnation heuristic on the worst kept distance
    if (j > 0 && maxVal == st.preVal) stoped += (hi - lo)
    else if (j > 0) stoped = 0
    if (stoped >= (st.require * 12).toInt && nDists >= k) recall = 1f
    val capped = j == levels - 1
    if (recall >= st.require || capped)
      st.copy(myNprobe = math.max(hi, (hi * multiplier).toInt),
        stoped = stoped, preVal = maxVal, predicted = recall,
        decidedStage = hi)
    else st.copy(stoped = stoped, preVal = maxVal)
  }

  /** Above this query-batch size the eager path's driver collect
    * (≤ nq × nlist/8 × k partial rows) stops being "small"; the lazy
    * path keeps everything distributed ([[graft.GraftConf.eagerMaxQueries]]). */
  private def EagerMaxQueries = graft.GraftConf.eagerMaxQueries

  /** Above this batch size even the lazy path's driver-held structures
    * (query vectors, centroid rankings, per-round broadcast probe maps
    * — all O(nq)) stop being "collectable"; the fully-distributed path
    * keeps the queries themselves in a DataFrame
    * ([[graft.GraftConf.distributedMinQueries]]). */
  private def DistributedMinQueries = graft.GraftConf.distributedMinQueries

  /** Control row for the fully-distributed path: the query vector, its
    * full centroid ranking, boundary-distance window AND running top-k
    * (`topIds`/`topDists`, sorted ascending by (dist, id)) ride WITH
    * the per-query decision state, so no per-query structure ever
    * exists on the driver — and each round's merge + recall prediction
    * + decision is ONE cogroup against the round's scan output instead
    * of a window shuffle, a summaries aggregation and a join (r18:
    * a07's per-round stage stack measured mostly scheduling on 32-task
    * near-empty stages). */
  final case class CtrlD(qid: Long, vec: Array[Float], require: Float,
                         lists: Array[Int], dB: Array[Float], myNprobe: Int,
                         stoped: Int, preVal: Double, predicted: Float,
                         decidedStage: Int,
                         topIds: Array[Long], topDists: Array[Double])

  /** @param queries (qid, vec, required_recall); batches up to
    *                [[DistributedMinQueries]] are collected to the
    *                driver (the reference's own contract — its driver
    *                holds all queries in RAM), larger ones stay in a
    *                DataFrame end-to-end ([[searchDistributed]])
    * @param multiplier calibration multiplier (`hyperparameter.txt`)
    * @param stdM       σ-margin multiplier
    */
  def search(ivfData: DataFrame, model: IVFModel, traces: Array[Trace],
             queries: DataFrame, k: Int, multiplier: Float = 1.0f,
             stdM: Float = 1.0f, forceLazy: Boolean = false,
             forceDistributed: Boolean = false): Result = {
    val spark = ivfData.sparkSession
    import spark.implicits._

    val nlist = model.nlist
    val levels = traces.length

    // path probe: a LIMIT-bounded count, not queries.count() — the full
    // count is a whole job over the query plan spent only on routing,
    // and for the huge batches it exists to detect it scans everything
    // twice (once to count, once in searchDistributed)
    if (forceDistributed ||
        queries.limit(DistributedMinQueries + 1).count() > DistributedMinQueries)
      return searchDistributed(ivfData, model, traces, queries, k,
        multiplier, stdM)

    val qRows: Array[(Long, Array[Float], Float)] = queries
      .select(col("qid").cast("long"), col("vec"),
        col("required_recall").cast("float"))
      .as[(Long, Array[Float], Float)].collect().sortBy(_._1)
    val nq = qRows.length
    val qVecs = qRows.map { case (qid, v, r) =>
      (qid, if (model.metric == "ip") Kernels.l2Normalize(v) else v, r)
    }
    // rank only as deep as the ROUNDS need (decision cap nlist/8 plus
    // the boundary geometry's nlist/8 + 20 window). The finishing pass
    // can probe out to stage × multiplier — but only for the few
    // queries that cap out, so those re-rank deeper individually below
    // instead of paying nq × full-depth rankings up front (at 100k
    // queries × nlist=1024 the eager form shipped >1 GiB of rankings
    // to the driver; the shallow form is ~4× smaller and the deep
    // re-rank touches only the capped tail)
    val shallowDepth = math.min(nlist, nlist / 8 + 20)
    val ranks = IVFSearch.rankTop(spark, model,
      qVecs.map(v => (v._1, v._2)), shallowDepth)
    val dBs = ranks.map { r =>
      ErrorProfile.boundaryDistances(r.map(_._2), r.map(_._1), model.interdisAt, nlist)
    }

    // per-query boundary distances broadcast once for executor-side recall
    val bDBs = spark.sparkContext.broadcast(
      qVecs.indices.map(i => (qVecs(i)._1, dBs(i))).toMap)

    // driver-collectable batches decide DRIVER-side (shared Decider,
    // bit-identical to the lazy path's executor-side decisions):
    //  - levels ≤ 4 (nlist ≤ 128): eager one-pass scan of all staged
    //    lists (≤ nlist/8 per query) — over-probing vs adaptive stop is
    //    bounded by that cap, and one job beats per-round round-trips
    //  - deeper schedules: adaptive per-round scans like the lazy path,
    //    but ONE action per round (scan + top-k merge, collected) and
    //    no per-round ctrl caching/joins — the lazy loop's ~3 actions +
    //    cache churn per round were the measured job floor on the
    //    figure-10 compare twin (r11_compare_10m.log: 7-round schedules
    //    at 10-200-query batches paid more scheduling than scanning)
    if (nq <= EagerMaxQueries && !forceLazy) {
      val decider = new Decider(nq, k, model.metric, traces, dBs,
        qVecs.map(_._3), multiplier, stdM, levels)
      return if (levels <= 4)
        searchEagerStaged(ivfData, model, qVecs, ranks, decider, k)
      else
        searchStagedDriver(ivfData, model, qVecs, ranks, decider, k,
          shallowDepth)
    }

    // distributed control state: one Ctrl row per query, CARRYING the
    // query's running top-k (the CtrlD fusion applied to the lazy
    // path). The driver never holds per-query decision state — it
    // collects only the shrinking active-qid list per round (to build
    // the pruned probe map) and the final O(nq) stats.
    var ctrl: org.apache.spark.sql.Dataset[Ctrl] =
      qVecs.map { case (qid, _, r) => Ctrl(qid, r, 0, 0, Double.NaN, 0f, 0) }
        .toSeq.toDS().cache()
    // round 0's active set is every query BY CONSTRUCTION (all control
    // rows start with myNprobe == 0) — no job; each later round's set
    // rides the action that materializes that round's control cache
    // (one action per round where this loop used to pay an extra
    // active-qid collect plus a bare count)
    var activeQids: Set[Long] = qVecs.map(_._1).toSet

    var j = 0
    while (j < levels && activeQids.nonEmpty) {
      val lo = if (j == 0) 0 else 1 << (j - 1) // probe ranks (lo, hi]
      val hi = 1 << j
      locally {
        val active = (0 until nq).filter(qi => activeQids(qVecs(qi)._1))
        val probeMap: Map[Int, Array[Int]] = active.flatMap { qi =>
          ranks(qi).slice(lo, hi).map { case (l, _) => (l, qi) }
        }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }

        val newPartials = scanLists(ivfData, model.metric, probeMap,
          qVecs.map(v => (v._1, v._2)), k).as[(Long, Long, Double)]
        // merge + recall prediction + decision in ONE cogroup on qid
        // (the searchDistributed fusion): the running top-k lives in
        // the control row — no separate state cache, window re-rank,
        // sort_array summaries aggregation or ctrl join per round.
        // Merged arrays are identical to mergeTopK's rows (same
        // k-smallest under the same (dist, id) total order; ids unique
        // per query across rounds — rank ranges are disjoint), and the
        // geometric recall prediction still runs WHERE THE TOP-K IS.
        val bTrace = spark.sparkContext.broadcast(traces(j))
        val jj = j
        val kk = k
        val met = model.metric
        val sm = stdM
        val mult = multiplier
        val lv = levels
        val prevCtrl = ctrl
        ctrl = ctrl.groupByKey(_.qid)
          .cogroup(newPartials.groupByKey(_._1)) { (_, cIt, pIt) =>
            val dbs = bDBs.value
            cIt.map { c =>
              val cand = pIt.toArray
              var ids = c.topIds
              var dists = c.topDists
              if (cand.nonEmpty) {
                val n = ids.length + cand.length
                val d2 = new Array[Double](n); val i2 = new Array[Long](n)
                System.arraycopy(dists, 0, d2, 0, dists.length)
                System.arraycopy(ids, 0, i2, 0, ids.length)
                var x = ids.length
                cand.foreach { p => d2(x) = p._3; i2(x) = p._2; x += 1 }
                val order = Array.range(0, n).sortBy(ix => (d2(ix), i2(ix)))
                val keep = math.min(kk, n)
                dists = new Array[Double](keep); ids = new Array[Long](keep)
                x = 0
                while (x < keep) {
                  dists(x) = d2(order(x)); ids(x) = i2(order(x)); x += 1
                }
              }
              val st = c.copy(topIds = ids, topDists = dists)
              // only still-active queries with ANY accumulated top-k
              // advance — the same (np != 0 || no summary) gate the
              // joined shape applied
              if (c.myNprobe != 0 || ids.isEmpty) st
              else {
                val recall = BoundedSearch.predictedRecall(
                  dists, dbs(c.qid), bTrace.value, jj, kk, sm, met)
                BoundedSearch.decideStep(st, jj, lv, kk, mult,
                  recall, dists.length, dists(dists.length - 1))
              }
            }
          }.cache()
        // ONE action: materializes the new control cache AND returns
        // the next round's active set — myNprobe only transitions
        // active → decided, so an empty set ends the loop. Only then is
        // it safe to drop the previous round's copy.
        activeQids = ctrl.filter(_.myNprobe == 0).map(_.qid).collect().toSet
        prevCtrl.unpersist()
      }
      j += 1
    }

    // the one per-query collect: final stats (O(nq) scalars — the top-k
    // arrays stay distributed), which also drive the finishing-pass
    // probe map
    val fin: Array[(Long, Int, Float, Int)] = ctrl
      .map(c => (c.qid, c.myNprobe, c.predicted, c.decidedStage))
      .collect().sortBy(_._1)

    // per-query top-k rows for the finishing merge, exploded once from
    // the control rows (during the rounds they never leave them)
    var state: DataFrame = ctrl.flatMap { c =>
      c.topIds.indices.iterator.map(i => (c.qid, c.topIds(i), c.topDists(i)))
    }.toDF("qid", "id", "dist")

    // finishing pass: each query probes on from its decision stage out to
    // stage × multiplier lists (the reference keeps probing until
    // stage ≥ my_nprobe, `IndexIVF.cpp:612-618`)
    val extraMap = finishingProbeMap(spark, model, qVecs.map(v => (v._1, v._2)),
      ranks, shallowDepth,
      qi => (fin(qi)._4, math.min(fin(qi)._2, nlist)))

    if (extraMap.nonEmpty) {
      val extra = scanLists(ivfData, model.metric, extraMap,
        qVecs.map(v => (v._1, v._2)), k)
      state = state.unionByName(extra)
    }
    // materialize through the checkpoint so the result no longer
    // depends on the cached control rows released below
    val results = FlatSearch.mergeTopK(state, k).localCheckpoint(eager = true)
    ctrl.unpersist()

    val stats = (0 until nq).map { qi =>
      QueryStats(qVecs(qi)._1, math.min(fin(qi)._2, nlist),
        fin(qi)._3, fin(qi)._4)
    }
    Result(results, stats)
  }

  /** Fully-distributed staged rounds for query batches past the
    * driver-collectable contract (> [[DistributedMinQueries]]): the
    * query vectors, centroid rankings, boundary windows and decision
    * state all live in one [[CtrlD]] Dataset; each round's probe set
    * is a flatMap over the active control rows, and the probed-list
    * scan is a LIST-KEYED COGROUP between the IVF table and the probe
    * rows (both shuffle on the 4-byte list_no key) with per-query
    * bounded heaps inside each list group. The driver's only per-query
    * moment is the final O(nq) stats collect, matching the reference's
    * own per-query result arrays.
    *
    * Decisions are identical to the lazy/eager paths by construction:
    * same [[IVFModel.rankCentroids]] coarse ranking, same
    * [[ErrorProfile.boundaryDistances]] window, same [[predictedRecall]]
    * and [[decideStep]] transition on the same sorted state distances.
    *
    * Scale shape: per round the big side carries only the PROBED lists'
    * rows (partition/bucket-pruned), and the probe side carries
    * active × (hi−lo) rows of ~(d·4+16) bytes. On a list_no-BUCKETED
    * table ([[graft.index.IVFIndex.writeBucketed]]) the scan is a
    * bucket-local fused cogroup with NO data-side shuffle at all
    * ([[scanListsJoin]], plan-asserted by BoundedBucketSpec);
    * unbucketed, the cogroup shuffles nprobed/nlist of the corpus per
    * round — the price of not holding nq-sized maps anywhere. Skewed
    * query distributions (every query ranking the same lists) are
    * bounded by per-list SALTING in [[scanListsCogroup]], which also
    * serves as the bucketed path's skew fallback. */
  private def searchDistributed(ivfData: DataFrame, model: IVFModel,
      traces: Array[Trace], queries: DataFrame, k: Int,
      multiplier: Float, stdM: Float): Result = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val nlist = model.nlist
    val levels = traces.length
    val met = model.metric
    val bm = spark.sparkContext.broadcast(model)

    // bucketed fast path: on a list_no-bucketed table the per-round list
    // scan is a bucket-local fused cogroup — the data-side shuffle drops out
    // entirely (asserted by BoundedBucketSpec's plan inspection). The
    // salted cogroup remains the fallback for unbucketed tables, for
    // hot-list skew beyond the per-task probe bound, AND — per the
    // measured crossover — for rounds too small to amortize the fused
    // arm's coarser task granularity.
    val nBuckets = listNoBuckets(ivfData)
    // per-list sizes for the crossover guard — layout metadata
    // (IndexCache.listSizes memo: sidecar-seeded for IndexCache-built
    // frames, one groupBy job per table per session otherwise), so no
    // job runs per search call; only fused-eligible layouts ask. The
    // guard's probed-volume estimate is now EXACT (sum of the probed
    // lists' actual sizes, not probed-count × mean) — same crossover
    // constant, better estimate under list skew.
    val listSizes: Map[Long, Long] =
      if (nBuckets.isDefined) graft.index.IndexCache.listSizes(ivfData)
      else Map.empty
    def scanRound(p: org.apache.spark.sql.Dataset[(Int, Long, Array[Float])],
                  counts: Map[Int, Long]): DataFrame = {
      // the bucket-local kernel streams one list group at a time, so
      // its per-task peak is the largest single list's probe array
      // (qvec + heap per probe) — not the bucket's sum — which is why
      // its per-list bound is 8× the cogroup's per-task bound; the
      // avg-per-bucket check stays as a belt-and-braces guard. Beyond
      // either bound, the salted cogroup is the right tool (it can
      // split a hot list across tasks; a bucket-local scan cannot).
      // The third clause is the engine obeying its own measurements
      // (r9 scale sweep, encoded in GraftConf.fusedMinProbedRows): a
      // round whose scan volume (sum of the probed lists' sizes, from
      // index metadata) sits below the crossover routes to the salted cogroup
      // even on a fused-eligible layout — small bucketed corpora
      // otherwise paid ~60% on every bounded query for a layout choice
      // that only helps at serving scale.
      val joinOk = nBuckets.exists { nb =>
        counts.values.max <= maxProbesPerBucket &&
          counts.values.sum / nb <= maxProbesPerBucket &&
          counts.keysIterator.map(l => listSizes.getOrElse(l.toLong, 0L))
            .sum >= graft.GraftConf.fusedMinProbedRows
      }
      lastScanRoute.set(if (joinOk) "fused" else "cogroup")
      if (joinOk) scanListsJoin(ivfData, met, p, counts.keys.toSeq.sorted, k)
      else scanListsCogroup(ivfData, met, p, counts, k)
    }

    var ctrl: org.apache.spark.sql.Dataset[CtrlD] = queries
      .select(col("qid").cast("long"), col("vec"),
        col("required_recall").cast("float"))
      // the map below does O(nq × nlist × d) work (full centroid ranking
      // per query) — by far the heaviest narrow transform on this path —
      // and inherits the INPUT's partitioning. A query batch arriving as
      // few partitions (e.g. through a GlobalLimit, which collapses to
      // ONE) would serialize it: the r10 task-time instrumentation found
      // a single 263-s task at 20M/200k doing exactly this in every arm.
      // The repartition is O(nq × d) bytes — noise against the ranking
      // work it parallelizes — and per-qid decisions are order-
      // independent, so results are unchanged.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float], Float)]
      .map { case (qid, v0, req) =>
        val m = bm.value
        val v = if (m.metric == "ip") Kernels.l2Normalize(v0) else v0
        val r = m.rankCentroids(v)
        val dB = ErrorProfile.boundaryDistances(
          r.map(_._2), r.map(_._1), m.interdisAt, m.nlist)
        CtrlD(qid, v, req, r.map(_._1), dB, 0, 0, Double.NaN, 0f, 0,
          Array.emptyLongArray, Array.emptyDoubleArray)
      }.cache()

    // per-round probe-list histogram (empty-round check, Parquet
    // partition pruning, hot-list salt factors). Each round's map rides
    // the SAME action that materializes that round's control cache —
    // round 0's materializes the init — where this loop used to pay a
    // bare count() per round PLUS a separate histogram job: one action
    // per round instead of two. A lean list-only projection; counts are
    // identical to grouping the full (list, qid, vec) probe rows.
    def probeListCounts(c: org.apache.spark.sql.Dataset[CtrlD],
                        round: Int): Map[Int, Long] = {
      val lo = if (round == 0) 0 else 1 << (round - 1)
      val hi = 1 << round
      c.filter(_.myNprobe == 0)
        .flatMap(_.lists.slice(lo, hi).iterator)
        .groupByKey(identity).count().collect().toMap
    }
    var listCounts: Map[Int, Long] = probeListCounts(ctrl, 0)

    var j = 0
    // empty histogram ⟺ no active queries (decisions never reopen):
    // remaining rounds are no-ops — stop instead of paying a job each
    while (j < levels && listCounts.nonEmpty) {
      val lo = if (j == 0) 0 else 1 << (j - 1)
      val hi = 1 << j
      val probes = ctrl.filter(_.myNprobe == 0).flatMap { c =>
        c.lists.slice(lo, hi).iterator.map(l => (l, c.qid, c.vec))
      }
      locally {
        val newPartials = scanRound(probes, listCounts).as[(Long, Long, Double)]
        val bTrace = spark.sparkContext.broadcast(traces(j))
        val jj = j; val kk = k; val sm = stdM; val mult = multiplier
        val lv = levels
        val prevCtrl = ctrl
        // merge + recall prediction + decision in ONE cogroup on qid:
        // the running top-k lives in the control row, so the round's
        // only per-query state movement is the scan output — the old
        // shape's separate state cache (window shuffle to re-rank it,
        // sort_array summaries aggregation, left join back onto ctrl,
        // per-late-round eager localCheckpoint) is gone. Merged arrays
        // are identical to mergeTopK's rows by construction: both take
        // the k smallest of the union under the same total order
        // (dist, id), and ids are unique per query across rounds (each
        // list is probed at most once — rank ranges are disjoint).
        ctrl = ctrl.groupByKey(_.qid)
          .cogroup(newPartials.groupByKey(_._1)) { (_, cIt, pIt) =>
            cIt.map { c =>
              val cand = pIt.toArray
              var ids = c.topIds
              var dists = c.topDists
              if (cand.nonEmpty) {
                val n = ids.length + cand.length
                val d2 = new Array[Double](n); val i2 = new Array[Long](n)
                System.arraycopy(dists, 0, d2, 0, dists.length)
                System.arraycopy(ids, 0, i2, 0, ids.length)
                var x = ids.length
                cand.foreach { p => d2(x) = p._3; i2(x) = p._2; x += 1 }
                val order = Array.range(0, n).sortBy(ix => (d2(ix), i2(ix)))
                val keep = math.min(kk, n)
                dists = new Array[Double](keep); ids = new Array[Long](keep)
                x = 0
                while (x < keep) {
                  dists(x) = d2(order(x)); ids(x) = i2(order(x)); x += 1
                }
              }
              // only still-active queries with ANY accumulated top-k
              // advance — the same (np != 0 || no summary) gate the
              // joined shape applied
              if (c.myNprobe != 0 || ids.isEmpty)
                c.copy(topIds = ids, topDists = dists)
              else {
                val recall = BoundedSearch.predictedRecall(
                  dists, c.dB, bTrace.value, jj, kk, sm, met)
                val maxVal = dists(dists.length - 1)
                val next = BoundedSearch.decideStep(
                  Ctrl(c.qid, c.require, c.myNprobe, c.stoped, c.preVal,
                    c.predicted, c.decidedStage),
                  jj, lv, kk, mult, recall, dists.length, maxVal)
                c.copy(myNprobe = next.myNprobe, stoped = next.stoped,
                  preVal = next.preVal, predicted = next.predicted,
                  decidedStage = next.decidedStage,
                  topIds = ids, topDists = dists)
              }
            }
          }.cache()
        // ONE action: materializes the new control cache AND yields the
        // NEXT round's probe histogram — only then drop the previous
        // round's copy
        listCounts = probeListCounts(ctrl, j + 1)
        prevCtrl.unpersist()
      }
      j += 1
    }

    // per-query top-k rows for the finishing merge, exploded once from
    // the control rows (during the rounds they never leave them)
    var state: DataFrame = ctrl.flatMap { c =>
      c.topIds.indices.iterator.map(i => (c.qid, c.topIds(i), c.topDists(i)))
    }.toDF("qid", "id", "dist")

    // finishing pass: decisionStage → stage × multiplier, probe lists
    // straight out of each control row's own ranking
    val nl = nlist
    val finProbes = ctrl.flatMap { c =>
      val upto = math.min(c.myNprobe, nl)
      if (upto > c.decidedStage)
        c.lists.slice(c.decidedStage, upto).iterator.map(l => (l, c.qid, c.vec))
      else Iterator.empty
    }
    val finCounts = finProbes.groupByKey(_._1).count().collect().toMap
    if (finCounts.nonEmpty)
      state = state.unionByName(scanRound(finProbes, finCounts))
    // materialize through the checkpoint so the result no longer
    // depends on the cached control rows we are about to release
    val results = FlatSearch.mergeTopK(state, k).localCheckpoint(eager = true)

    val stats = ctrl
      .map(c => (c.qid, math.min(c.myNprobe, nl), c.predicted, c.decidedStage))
      .collect().sortBy(_._1)
      .map { case (qid, np, pred, ds0) => QueryStats(qid, np, pred, ds0) }
      .toSeq
    ctrl.unpersist()
    Result(results, stats)
  }

  /** Each (list, salt) cogroup task materializes its probe rows (query
    * vector + one TopK heap per probe); this caps how many probes one
    * task may hold. A hot list under a skewed query distribution —
    * every query ranking the same list first — would otherwise
    * concentrate ALL query vectors in a single executor task.
    * Override: the `graft.cogroup.maxProbes` system property
    * ([[graft.GraftConf.cogroupMaxProbes]]). */
  private def maxProbesPerTask: Int = graft.GraftConf.cogroupMaxProbes

  /** Per-list probe bound for the bucket-local path (see `scanRound`
    * in [[searchDistributed]]): list groups are consumed one at a time,
    * so a task's peak state is one list's probe array — the default is
    * 8× the cogroup's per-task bound (~40 MB peak at d=64, k=10).
    * Override: `graft.join.maxProbesPerBucket`
    * ([[graft.GraftConf.joinMaxProbesPerBucket]]). */
  private def maxProbesPerBucket: Int = graft.GraftConf.joinMaxProbesPerBucket

  /** Test hook: which scan route ("fused" | "cogroup") the last
    * distributed round on this thread took — the router's crossover
    * guard is pinned by observing the decision at its real site
    * (BoundedBucketSpec's router tests) rather than re-deriving it. */
  private[graft] val lastScanRoute = new ThreadLocal[String]

  /** Salt sub-keys per list are capped so the key packing below stays
    * within the 24 bits reserved for the salt — at maxProbesPerTask's
    * default that is ~137 G probes on ONE list before the per-task
    * bound can no longer be honored; if it ever fires, it fires loudly
    * (log.warn below) instead of silently over-packing tasks. */
  private val MaxSaltFactor = 1 << 24

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** List-keyed cogroup scan: for each probed list, stream its vectors
    * against the (qid, qvec) probe rows for that list with per-query
    * bounded heaps — the distributed twin of [[scanLists]] (which
    * broadcasts a driver-built probe map instead). Emits ≤ k rows per
    * (list, query).
    *
    * Skew guard: per-list probe counts (≤ nlist scalars) are collected
    * first; a list with more than [[maxProbesPerTask]] probes is SALTED
    * — its probes split across `ceil(count / maxProbesPerTask)` sub-keys
    * by qid hash, and its data rows are replicated once per sub-key, so
    * each task holds a bounded probe set and still scans the full list.
    * Results are identical by construction (every probe sees every row
    * of its list exactly once); the cost is re-reading hot lists once
    * per salt — paid only where the skew actually is. */
  private def scanListsCogroup(ivfData: DataFrame, metric: String,
      probes: org.apache.spark.sql.Dataset[(Int, Long, Array[Float])],
      listCounts: Map[Int, Long], k: Int): DataFrame = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    // per-list probe counts (caller-computed, ≤ nlist entries) drive
    // Parquet partition pruning AND the hot-list salt factors
    val maxProbes = maxProbesPerTask
    val salts: Map[Int, Int] = listCounts.map { case (l, c) =>
      val want = (c + maxProbes - 1) / maxProbes
      if (want > MaxSaltFactor)
        log.warn(s"scanListsCogroup: salt factor for list $l clamped " +
          s"$want -> $MaxSaltFactor; tasks for this list exceed the " +
          s"$maxProbes-probe bound")
      l -> math.min(MaxSaltFactor.toLong, want).toInt
    }
    val bSalts = spark.sparkContext.broadcast(salts)
    def key(l: Int, s: Int): Long = (l.toLong << 24) | s.toLong
    val dataG = ivfData
      .filter(col("list_no").isin(listCounts.keys.toSeq.sorted: _*))
      .select(col("list_no").cast("int"), col("id").cast("long"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .flatMap { case (l, id, vec) =>
        val s = bSalts.value.getOrElse(l, 1)
        (0 until s).iterator.map(si => (key(l, si), id, vec))
      }
      .groupByKey(_._1)
    val probeG = probes.map { case (l, qid, vec) =>
      val s = bSalts.value.getOrElse(l, 1)
      (key(l, math.floorMod(qid, s.toLong).toInt), qid, vec)
    }.groupByKey(_._1)
    dataG.cogroup(probeG) { (_, dataIt, probeIt) =>
      val ps = probeIt.toArray
      if (ps.isEmpty) Iterator.empty
      else {
        val heaps = ps.map(_ => new TopK(k))
        dataIt.foreach { case (_, id, vec) =>
          var i = 0
          while (i < ps.length) {
            heaps(i).add(Kernels.distance(metric, ps(i)._3, vec), id)
            i += 1
          }
        }
        ps.iterator.zip(heaps.iterator).flatMap { case (p, h) =>
          h.sorted.iterator.map { case (d, id) => (p._2, id, d) }
        }
      }
    }.toDF("qid", "id", "dist")
  }

  /** If `df`'s data will come out of its source already hash-partitioned
    * on exactly `list_no` — a `bucketBy(list_no)` table scan, or a
    * memory-resident relation cached under a `repartition(n, list_no)`
    * distribution (the serving deployment: index shards held hot in
    * executor memory) — the partition count: the signal that
    * [[scanListsJoin]]'s data side needs no Exchange. A wrong answer
    * here cannot corrupt results — Catalyst's EnsureRequirements
    * re-inserts the Exchange if the distribution is not actually
    * satisfied; this only selects join vs cogroup. */
  private[graft] def listNoBuckets(df: DataFrame): Option[Int] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.bucketSpec
              .filter(_.bucketColumnNames
                .map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("list_no"))
              .map(_.numBuckets)
          case _ => None
        }
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        m.cachedPlan.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
              if h.expressions.length == 1 && h.expressions.head.collectFirst {
                case a: org.apache.spark.sql.catalyst.expressions.Attribute
                    if a.name.toLowerCase(java.util.Locale.ROOT) == "list_no" => a
              }.isDefined =>
            Some(h.numPartitions)
          case _ => None
        }
    }.flatten.headOption

  /** Bucket-local twin of [[scanListsCogroup]] for list_no-bucketed
    * tables: probed lists are BUCKET-PRUNED out of the scan, and the
    * cogroup on the `list_no` COLUMN ([[RelationalGroupedDataset.as]]
    * keys by the real attribute, not a lambda-synthesized key) reuses
    * the scan's bucket partitioning — `HashPartitioning(list_no)`
    * satisfies the cogroup's ClusteredDistribution, so the probe side
    * (the small one) is the only Exchange, and both layouts' existing
    * sort-by-list_no satisfies the required ordering without a
    * per-round sort. Inside each list group runs the SAME fused
    * kernel as the salted cogroup (probe array + one bounded [[TopK]]
    * per probe, one streamed pass over the list's rows), emitting
    * ≤ k rows per (list, query).
    *
    * History: the first version of this path was a sort-merge JOIN on
    * `list_no` feeding a codegen'd distance column into a per-partition
    * (qid → heap) map. It removed the same Exchange but paid ~3× the
    * cogroup's wall-clock at 10M/200k (r9 A/B,
    * `tools/evidence/r9_scale_ab_10m.log`): per-PAIR join plumbing —
    * SMJ iteration, projection, typed deserialization, per-pair hash
    * lookups over ~25 B pairs — against the cogroup kernel's per-ROW
    * deserialization and tight probes loop. This rewrite keeps the
    * Exchange-free plan and the fused kernel's per-pair cost.
    * Correctness does not ride on the partitioning being recognized:
    * EnsureRequirements re-adds the Exchange if the distribution is
    * not actually satisfied (plan-asserted by BoundedBucketSpec).
    *
    * Measured crossover (constant list size n/nlist = 9766, resident
    * arms; r10 POST-fix numbers — the r9 sweep's 10M-crossover reading
    * was distorted by the serialized control-build stage both arms
    * carried, see the `searchDistributed` repartition comment): the
    * salted cogroup wins up to and including the 20M point (fused
    * 1.29× slower there), the fused arm wins from the 40M point (0.73×,
    * 45% fewer shuffle bytes) — `tools/evidence/
    * r10_scale_ab_{20m100k,40m100k}.log`. The router ENFORCES that
    * crossover per round (`scanRound`'s
    * [[graft.GraftConf.fusedMinProbedRows]] guard): a bucketed/resident
    * layout is necessary but not sufficient — rounds whose estimated
    * scan volume sits below the crossover still take the salted
    * cogroup, so bucketing a small index costs nothing. Pre-bucket /
    * resident-distribute at serving scale; on a real cluster the
    * elided Exchange is network, which argues for lowering the
    * threshold there. */
  private[graft] def scanListsJoin(ivfData: DataFrame, metric: String,
      probes: org.apache.spark.sql.Dataset[(Int, Long, Array[Float])],
      probedLists: Seq[Int], k: Int): DataFrame = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val data = ivfData
      .filter(col("list_no").isin(probedLists: _*))
      .select(col("list_no").cast("int").as("list_no"),
        col("id").cast("long").as("id"), col("vec"))
    // CoGroup requires bit-identical key SCHEMAS (name, type,
    // nullability) on both sides. The data side's key must stay a bare
    // alias of the scanned column — wrapping it would break the
    // alias-aware partitioning propagation this whole path exists for —
    // so the probe side's key (tuple-encoded, non-nullable) adapts to
    // whatever nullability the data layout reports. list_no is never
    // actually null (it is an assigned cluster id), so both wrappers
    // are semantic no-ops.
    val probeKey =
      if (data.schema("list_no").nullable)
        // identity for non-null input, but analyzed as nullable
        // (when(lit(true), c) is folded back to non-nullable c by the
        // Spark 4 analyzer; the isNotNull guard is not)
        when(col("list_no").isNotNull, col("list_no"))
      else org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("list_no"))))
    val dataG = data
      .groupBy(col("list_no"))
      .as[Int, (Int, Long, Array[Float])]
    val probeG = probes.toDF("list_no", "qid", "qvec")
      .select(probeKey.as("list_no"), col("qid"), col("qvec"))
      .groupBy(col("list_no"))
      .as[Int, (Int, Long, Array[Float])]
    dataG.cogroup(probeG) { (_, dataIt, probeIt) =>
      val ps = probeIt.toArray
      if (ps.isEmpty) Iterator.empty
      else {
        val heaps = ps.map(_ => new TopK(k))
        dataIt.foreach { case (_, id, vec) =>
          var i = 0
          while (i < ps.length) {
            heaps(i).add(Kernels.distance(metric, ps(i)._3, vec), id)
            i += 1
          }
        }
        ps.iterator.zip(heaps.iterator).flatMap { case (p, h) =>
          h.sorted.iterator.map { case (d, id) => (p._2, id, d) }
        }
      }
    }.toDF("qid", "id", "dist")
  }

  /** The per-stage termination decision (`IndexIVF.cpp:504-637`):
    * shared verbatim by the lazy (round-per-stage) and eager
    * (one-scan staged) execution paths so both produce identical
    * results. Holds the O(nq) control state. */
  private final class Decider(nq: Int, k: Int, metric: String,
      traces: Array[Trace], dBs: Array[Array[Float]], requires: Array[Float],
      multiplier: Float, stdM: Float, levels: Int) extends Serializable {
    def nLevels: Int = levels
    val myNprobe = new Array[Int](nq)
    val stoped = new Array[Int](nq)
    val preVal = Array.fill(nq)(Double.NaN)
    val predicted = new Array[Float](nq)
    val decidedStage = new Array[Int](nq)

    /** Evaluate query qi at stage 2^j given its current sorted top-k
      * raw distances (driver-side math; the lazy path instead computes
      * the recall on executors and calls [[decide]]). */
    def evaluate(qi: Int, j: Int, dRaw: Array[Double]): Unit = {
      val recall = BoundedSearch.predictedRecall(
        dRaw, dBs(qi), traces(j), j, k, stdM, metric)
      val maxVal = if (dRaw.isEmpty) Double.NaN else dRaw.max
      decide(qi, j, recall, dRaw.length, maxVal)
    }

    /** Stagnation bookkeeping + termination decision from the three
      * per-query scalars — delegates to the shared [[decideStep]]
      * transition so eager and lazy decisions are identical by
      * construction. Callers only invoke this for active queries. */
    def decide(qi: Int, j: Int, recallRaw: Float, nDists: Int,
               maxVal: Double): Unit = {
      val next = BoundedSearch.decideStep(
        Ctrl(0L, requires(qi), myNprobe(qi), stoped(qi), preVal(qi),
          predicted(qi), decidedStage(qi)),
        j, levels, k, multiplier, recallRaw, nDists, maxVal)
      myNprobe(qi) = next.myNprobe
      stoped(qi) = next.stoped
      preVal(qi) = next.preVal
      predicted(qi) = next.predicted
      decidedStage(qi) = next.decidedStage
    }
  }

  /** Pure per-query recall prediction — the executor-side piece of the
    * decision (the `IndexIVF.cpp:504-637` tune block minus the
    * stagnation rule, which needs cross-round driver state): arccos
    * for the IP/angle metric, then curNum/k from the trace. */
  def predictedRecall(dRaw: Array[Double], dB: Array[Float],
                      trace: Trace, j: Int, k: Int, stdM: Float,
                      metric: String): Float = {
    val dists =
      if (metric == "ip") dRaw.map(d => ErrorProfile.arcos((-d).toFloat))
      else dRaw.map(_.toFloat)
    if (dists.length < k) 0f
    else ErrorProfile.curNum(dists, dB, trace, j, k, stdM).toFloat / k
  }

  /** Eager variant for shallow schedules (levels ≤ 3, i.e. nlist ≤ 64):
    * ALL staged lists (≤ nlist/8 = 4 per query) are scanned in ONE pass
    * with per-(query, first-probed-stage) heaps; stage top-ks and every
    * decision then run driver-side on the collected partials (≤
    * nq·4·k rows), eliminating the per-round job latency. Decisions are
    * bit-identical to the lazy path (same Decider, same staged top-ks);
    * for deep schedules the lazy path remains — eager would probe
    * nlist/8 lists per query where adaptive stops far earlier. */
  private def searchEagerStaged(ivfData: DataFrame, model: IVFModel,
      qVecs: Array[(Long, Array[Float], Float)],
      ranks: Array[Array[(Int, Float)]], decider: Decider,
      k: Int): Result = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val nq = qVecs.length
    val nlist = model.nlist
    val levels = decider.nLevels
    val maxRank = 1 << (levels - 1)

    val byList: Map[Int, Array[(Int, Int)]] = ranks.zipWithIndex.flatMap {
      case (r, qi) =>
        r.take(maxRank).zipWithIndex.map { case ((listNo, _), rankIdx) =>
          var j0 = 0
          while ((1 << j0) < rankIdx + 1) j0 += 1
          (listNo, (qi, j0))
        }
    }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2)) }
    val bByList = spark.sparkContext.broadcast(byList)
    val bQ = spark.sparkContext.broadcast(qVecs.map(v => (v._1, v._2)))
    val metric = model.metric

    val partials: Array[(Int, Int, Long, Double)] = ivfData
      .filter(col("list_no").isin(byList.keys.toSeq.sorted: _*))
      .select(col("list_no").cast("int"), col("id").cast("long"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .mapPartitions { it =>
        val lists = bByList.value
        val qs = bQ.value
        val heaps = scala.collection.mutable.HashMap.empty[(Int, Int), TopK]
        it.foreach { case (listNo, id, vec) =>
          lists.get(listNo) match {
            case Some(entries) =>
              var i = 0
              while (i < entries.length) {
                val (qi, j0) = entries(i)
                heaps.getOrElseUpdate((qi, j0), new TopK(k))
                  .add(Kernels.distance(metric, qs(qi)._2, vec), id)
                i += 1
              }
            case None =>
          }
        }
        heaps.iterator.flatMap { case ((qi, j0), h) =>
          h.sorted.iterator.map { case (d, id) => (qi, j0, id, d) }
        }
      }.collect()

    // driver-side: per query, cumulative stage top-ks drive the decisions
    val byQuery = partials.groupBy(_._1)
    val finalRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var qi = 0
    while (qi < nq) {
      byQuery.get(qi) match {
        case Some(rows) =>
          val byStage = rows.groupBy(_._2)
          var cum = Array.empty[(Double, Long)]
          var decidedTopk = Array.empty[(Double, Long)]
          var j = 0
          while (j < levels) {
            val add = byStage.getOrElse(j, Array.empty)
              .map(r => (r._4, r._3))
            cum = (cum ++ add).sortBy { case (d, id) => (d, id) }.take(k)
            if (decider.myNprobe(qi) == 0) {
              decider.evaluate(qi, j, cum.map(_._1))
              if (decider.myNprobe(qi) != 0) decidedTopk = cum
            }
            j += 1
          }
          decidedTopk.foreach { case (d, id) =>
            finalRows += ((qVecs(qi)._1, id, d))
          }
        case None =>
      }
      qi += 1
    }

    var state = finalRows.toSeq.toDF("qid", "id", "dist")

    // finishing pass: probe on from each query's decision stage
    val extraMap = finishingProbeMap(spark, model, qVecs.map(v => (v._1, v._2)),
      ranks, math.min(nlist, nlist / 8 + 20),
      qi2 => (decider.decidedStage(qi2), math.min(decider.myNprobe(qi2), nlist)))
    if (extraMap.nonEmpty) {
      val extra = scanLists(ivfData, metric, extraMap,
        qVecs.map(v => (v._1, v._2)), k)
      state = state.unionByName(extra)
    }
    val stats = (0 until nq).map { qi2 =>
      QueryStats(qVecs(qi2)._1, math.min(decider.myNprobe(qi2), nlist),
        decider.predicted(qi2), decider.decidedStage(qi2))
    }
    Result(FlatSearch.mergeTopK(state, k), stats)
  }

  /** Deep-schedule driver-decided rounds (levels > 4, nq ≤
    * [[EagerMaxQueries]]): the adaptive probing schedule of the lazy
    * path — round j scans centroid ranks (2^(j−1), 2^j] for still-
    * active queries only — but the per-query decision state lives in
    * the shared [[Decider]]'s O(nq) driver arrays instead of a cached
    * control Dataset. Each round is exactly ONE Spark action: the
    * probed-list partial scan merged to per-query round top-k
    * (bounded collect of ≤ active × k rows); the cumulative top-k
    * merge, recall prediction, and [[decideStep]] transition run on
    * the driver. Decisions are bit-identical to the lazy path by
    * construction: same rankings, same boundary windows, same
    * [[predictedRecall]] on the same cumulative sorted distances, same
    * transition — pinned by BoundedSearchSpec's deep-schedule
    * equivalence test. The lazy path remains the production route for
    * batches past the driver contract (4096 < nq ≤ 131072). */
  private def searchStagedDriver(ivfData: DataFrame, model: IVFModel,
      qVecs: Array[(Long, Array[Float], Float)],
      ranks: Array[Array[(Int, Float)]], decider: Decider, k: Int,
      shallowDepth: Int): Result = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val nq = qVecs.length
    val nlist = model.nlist
    val levels = decider.nLevels
    val qv = qVecs.map(v => (v._1, v._2))
    val qidToIdx: Map[Long, Int] = qv.map(_._1).zipWithIndex.toMap
    // cumulative decision-time top-k per query; stops growing once the
    // query leaves the active set — exactly the rows the lazy path's
    // state DataFrame would hold for it
    val cum = Array.fill(nq)(Array.empty[(Double, Long)])
    var j = 0
    var allDecided = false
    while (j < levels && !allDecided) {
      val lo = if (j == 0) 0 else 1 << (j - 1)
      val hi = 1 << j
      val active = (0 until nq).filter(decider.myNprobe(_) == 0)
      if (active.isEmpty) allDecided = true
      else {
        val probeMap: Map[Int, Array[Int]] = active.flatMap { qi =>
          ranks(qi).slice(lo, hi).map { case (l, _) => (l, qi) }
        }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }
        // merge partials to per-query top-k INSIDE the job so the
        // collect is ≤ active × k rows whatever the round's fan-out
        val roundTopK = FlatSearch.mergeTopK(
          scanLists(ivfData, model.metric, probeMap, qv, k), k)
          .select(col("qid").cast("long"), col("id").cast("long"),
            col("dist"))
          .as[(Long, Long, Double)].collect()
        val byQi = roundTopK.groupBy(r => qidToIdx(r._1))
        active.foreach { qi =>
          byQi.get(qi).foreach { rows =>
            val add = rows.map(r => (r._3, r._2))
            cum(qi) = (cum(qi) ++ add)
              .sortBy { case (d, id) => (d, id) }.take(k)
          }
          // like the lazy path, only queries with at least one scanned
          // row ever reach the decision transition
          if (cum(qi).nonEmpty) decider.evaluate(qi, j, cum(qi).map(_._1))
        }
      }
      j += 1
    }

    var state = (0 until nq).flatMap { qi =>
      cum(qi).map { case (d, id) => (qv(qi)._1, id, d) }
    }.toDF("qid", "id", "dist")

    // finishing pass: decisionStage → stage × multiplier, shared with
    // the other driver-decided path
    val extraMap = finishingProbeMap(spark, model, qv, ranks, shallowDepth,
      qi => (decider.decidedStage(qi), math.min(decider.myNprobe(qi), nlist)))
    if (extraMap.nonEmpty)
      state = state.unionByName(scanLists(ivfData, model.metric, extraMap,
        qv, k))
    val stats = (0 until nq).map { qi =>
      QueryStats(qv(qi)._1, math.min(decider.myNprobe(qi), nlist),
        decider.predicted(qi), decider.decidedStage(qi))
    }
    Result(FlatSearch.mergeTopK(state, k), stats)
  }

  /** Build the finishing-pass probe map from SHALLOW rankings: queries
    * whose probe target exceeds the shallow depth (the capped tail —
    * rare when the profile stops most queries early) re-rank deeper in
    * one small second pass, so the up-front coarse ranking never ships
    * nq × multiplier-depth rankings to the driver.
    * @param bounds qi → (decidedStage, probe target) */
  private def finishingProbeMap(spark: SparkSession, model: IVFModel,
      qVecs: Array[(Long, Array[Float])], ranks: Array[Array[(Int, Float)]],
      shallowDepth: Int, bounds: Int => (Int, Int)): Map[Int, Array[Int]] = {
    val nq = qVecs.length
    val deepIdx = (0 until nq).filter(qi => bounds(qi)._2 > shallowDepth)
    val deepRanks: Map[Int, Array[(Int, Float)]] =
      if (deepIdx.isEmpty) Map.empty
      else {
        val maxDeep = deepIdx.map(qi => bounds(qi)._2).max
        // rankTop aligns its result with input order, so the zip
        // aligns for any qid layout
        val dr = IVFSearch.rankTop(spark, model,
          deepIdx.map(qi => qVecs(qi)).toArray, maxDeep)
        deepIdx.zip(dr).toMap
      }
    (0 until nq).flatMap { qi =>
      val (from, upto) = bounds(qi)
      if (upto > from)
        deepRanks.getOrElse(qi, ranks(qi)).slice(from, upto)
          .map { case (l, _) => (l, qi) }
      else Nil
    }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }
  }

  /** Latency-bounded mode (`Auncel/IndexIVF.cpp:545-549`,
    * `profile.cpp:229-244`): the wall-clock budget becomes a
    * deterministic per-query probe budget via a calibrated per-list cost
    * — reproducible, unlike in-executor clock checks. */
  def timeSearch(ivfData: DataFrame, model: IVFModel, queries: DataFrame,
                 k: Int, costPerProbeMs: Double): Result = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val qRows = queries
      .select(col("qid").cast("long"), col("vec"), col("budget_ms").cast("double"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val qVecs = qRows.map { case (qid, v, _) =>
      (qid, if (model.metric == "ip") Kernels.l2Normalize(v) else v)
    }
    val budgets = qRows.map { case (_, _, b) =>
      math.max(1, math.min(model.nlist,
        (b * 0.95 / costPerProbeMs).toInt))
    }
    val ranks = IVFSearch.rankTop(spark, model, qVecs, budgets.max)
    val probeMap: Map[Int, Array[Int]] = qVecs.indices.flatMap { qi =>
      ranks(qi).take(budgets(qi)).map { case (l, _) => (l, qi) }
    }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }
    val partials = scanLists(ivfData, model.metric, probeMap, qVecs, k)
    val stats = qVecs.indices.map { qi =>
      QueryStats(qVecs(qi)._1, budgets(qi), -1f, budgets(qi))
    }
    Result(FlatSearch.mergeTopK(partials, k), stats)
  }

  /** Scan the given lists, computing per-partition bounded top-k only
    * for the queries probing each list. */
  private def scanLists(ivfData: DataFrame, metric: String,
                        probeMap: Map[Int, Array[Int]],
                        qVecs: Array[(Long, Array[Float])], k: Int): DataFrame = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    if (probeMap.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)].toDF("qid", "id", "dist")
    val bq = spark.sparkContext.broadcast(qVecs)
    val bp = spark.sparkContext.broadcast(probeMap)
    ivfData
      .filter(col("list_no").isin(probeMap.keys.toSeq.sorted: _*))
      .select(col("list_no").cast("int"), col("id").cast("long"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .mapPartitions { it =>
        val pm = bp.value
        val qs = bq.value
        val heaps = scala.collection.mutable.HashMap.empty[Int, TopK]
        it.foreach { case (listNo, id, vec) =>
          pm.get(listNo) match {
            case Some(qis) =>
              var i = 0
              while (i < qis.length) {
                val qi = qis(i)
                heaps.getOrElseUpdate(qi, new TopK(k))
                  .add(Kernels.distance(metric, qs(qi)._2, vec), id)
                i += 1
              }
            case None =>
          }
        }
        heaps.iterator.flatMap { case (qi, h) =>
          h.sorted.iterator.map { case (d, id) => (qs(qi)._1, id, d) }
        }
      }
      .toDF("qid", "id", "dist")
  }
}
