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
    * of lists probed (∝ bytes scanned at scale). */
  def sweep(ivfData: DataFrame, model: IVFModel, queries: DataFrame,
            k: Int): Seq[OperatingPoint] = {
    import ivfData.sparkSession.implicits._
    val exact = FlatSearch.knn(
      ivfData.select(col("id"), col("vec")), queries, k)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val points = Iterator.iterate(1)(_ * 2).takeWhile(_ < model.nlist).toSeq :+ model.nlist
    points.map { np =>
      val got = IVFSearch.search(ivfData, model, queries, k, np)
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = exact.map { case (q, ids) =>
        (got.getOrElse(q, Set.empty) & ids).size.toDouble / k
      }.toSeq
      OperatingPoint(np, recalls.sum / recalls.size, recalls.min,
        np.toDouble / model.nlist)
    }
  }

  /** Pareto front: drop points dominated in (cost ↓, recall ↑). */
  def paretoFront(points: Seq[OperatingPoint],
                  byMin: Boolean = true): Seq[OperatingPoint] = {
    def r(p: OperatingPoint) = if (byMin) p.minRecall else p.meanRecall
    points.sortBy(_.cost).foldLeft(Vector.empty[OperatingPoint]) { (acc, p) =>
      if (acc.isEmpty || r(p) > r(acc.last) + 1e-12) acc :+ p else acc
    }
  }

  /** Cheapest operating point meeting a worst-case recall target; falls
    * back to nprobe = nlist (which always exists in the sweep). */
  def select(points: Seq[OperatingPoint], minRecallTarget: Double): OperatingPoint =
    points.filter(_.minRecall >= minRecallTarget)
      .minByOption(_.cost)
      .getOrElse(points.maxBy(_.nprobe))
}
