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

  /** @param queries (qid, vec, required_recall) — driver-collectable
    *                (batch dimension; base data is the scale dimension)
    * @param multiplier calibration multiplier (`hyperparameter.txt`)
    * @param stdM       σ-margin multiplier
    */
  def search(ivfData: DataFrame, model: IVFModel, traces: Array[Trace],
             queries: DataFrame, k: Int, multiplier: Float = 1.0f,
             stdM: Float = 1.0f): Result = {
    val spark = ivfData.sparkSession
    import spark.implicits._

    val nlist = model.nlist
    val levels = traces.length

    val qRows: Array[(Long, Array[Float], Float)] = queries
      .select(col("qid").cast("long"), col("vec"),
        col("required_recall").cast("float"))
      .as[(Long, Array[Float], Float)].collect().sortBy(_._1)
    val nq = qRows.length
    val qVecs = qRows.map { case (qid, v, r) =>
      (qid, if (model.metric == "ip") Kernels.l2Normalize(v) else v, r)
    }
    val ranks = qVecs.map { case (_, v, _) => model.rankCentroids(v) }
    val dBs = ranks.map { r =>
      ErrorProfile.boundaryDistances(r.map(_._2), r.map(_._1), model.interdisAt, nlist)
    }

    // mutable driver-side control state (O(nq), never O(data))
    val myNprobe = new Array[Int](nq)
    val stoped = new Array[Int](nq)
    val preVal = Array.fill(nq)(Double.NaN)
    val predicted = new Array[Float](nq)
    val decidedStage = new Array[Int](nq)

    var state: DataFrame = spark.emptyDataset[(Long, Long, Double)]
      .toDF("qid", "id", "dist")
    val qidToIdx = qVecs.map(_._1).zipWithIndex.toMap

    var j = 0
    while (j < levels) {
      val lo = if (j == 0) 0 else 1 << (j - 1) // probe ranks (lo, hi]
      val hi = 1 << j
      val active = (0 until nq).filter(myNprobe(_) == 0)
      if (active.nonEmpty) {
        val probeMap: Map[Int, Array[Int]] = active.flatMap { qi =>
          ranks(qi).slice(lo, hi).map { case (l, _) => (l, qi) }
        }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }

        val newPartials = scanLists(ivfData, model.metric, probeMap,
          qVecs.map(v => (v._1, v._2)), k)
        val prev = state
        val merged = FlatSearch
          .mergeTopK(state.unionByName(newPartials), k)
          .select(col("qid"), col("id"), col("dist"))
        // cache: the decision collect below materializes this round once;
        // without it the next round's merge recomputes every prior scan.
        // localCheckpoint additionally truncates lineage once rounds
        // stack up (a full materialization — skip for shallow schedules).
        state = if (j >= 3) merged.localCheckpoint(eager = true)
                else merged.cache()
        prev.unpersist()

        // decision: per-query sorted top-k distances
        val topkD: Map[Long, Array[Double]] = state
          .groupBy(col("qid")).agg(sort_array(collect_list(col("dist"))).as("d"))
          .as[(Long, Array[Double])].collect().toMap

        active.foreach { qi =>
          val (qid, _, require) = qVecs(qi)
          topkD.get(qid).foreach { dRaw =>
            val dists =
              if (model.metric == "ip") dRaw.map(d => ErrorProfile.arcos((-d).toFloat))
              else dRaw.map(_.toFloat)
            var recall =
              if (dists.length < k) 0f
              else ErrorProfile.curNum(dists, dBs(qi), traces(j), j, k, stdM).toFloat / k
            // stagnation heuristic on the worst kept distance
            val maxVal = if (dRaw.isEmpty) Double.NaN else dRaw.max
            if (j > 0 && maxVal == preVal(qi)) stoped(qi) += (hi - lo)
            else if (j > 0) stoped(qi) = 0
            preVal(qi) = maxVal
            if (stoped(qi) >= (require * 12).toInt && dists.length >= k) recall = 1f
            val capped = j == levels - 1
            if ((recall >= require || capped) && myNprobe(qi) == 0) {
              myNprobe(qi) = math.max(hi, (hi * multiplier).toInt)
              predicted(qi) = recall
              decidedStage(qi) = hi
            }
          }
        }
      }
      j += 1
    }

    // finishing pass: each query probes on from its decision stage out to
    // stage × multiplier lists (the reference keeps probing until
    // stage ≥ my_nprobe, `IndexIVF.cpp:612-618`)
    val extraMap: Map[Int, Array[Int]] = (0 until nq).flatMap { qi =>
      val upto = math.min(myNprobe(qi), nlist)
      if (upto > decidedStage(qi))
        ranks(qi).slice(decidedStage(qi), upto).map { case (l, _) => (l, qi) }
      else Nil
    }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }

    if (extraMap.nonEmpty) {
      val extra = scanLists(ivfData, model.metric, extraMap,
        qVecs.map(v => (v._1, v._2)), k)
      state = state.unionByName(extra)
    }
    val results = FlatSearch.mergeTopK(state, k)

    val stats = (0 until nq).map { qi =>
      QueryStats(qVecs(qi)._1, math.min(myNprobe(qi), nlist), predicted(qi),
        decidedStage(qi))
    }
    Result(results, stats)
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
    val ranks = qVecs.map { case (_, v) => model.rankCentroids(v) }
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
