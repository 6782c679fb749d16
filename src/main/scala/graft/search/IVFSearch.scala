package graft.search

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.index.IVFModel
import graft.operators.TopK

/** Fixed-nprobe IVF top-k search — the Spark form of
  * `IndexIVF::search_preassigned` (`Auncel/IndexIVF.cpp:382-760`) without
  * the adaptive termination (that lives in [[BoundedSearch]]).
  *
  * Plan shape (scale-first):
  *  1. coarse quantization per query against the broadcast centroid
  *     matrix (nlist is small — `Auncel/eval/bound.cpp:220` uses 1024);
  *  2. the union of probed lists becomes `list_no IN (...)` → Parquet
  *     partition pruning, so only nprobe/nlist of the bytes are read;
  *  3. per-partition bounded top-k heaps per probing query (map-side
  *     combine), shuffling only `#parts × nq × k` rows;
  *  4. global merge = window rank (≡ `dist/reduce.cpp:98-119`).
  */
object IVFSearch {

  /** Coarse quantization for a (collected, metric-normalized) query
    * batch, returning only the top `top` ranked centroids per query,
    * ALIGNED WITH INPUT ORDER (`result(i)` ranks `q(i)` — every caller
    * indexes positionally, so both branches key on input position, not
    * qid; qids may be unsorted or sparse). Small batches rank on the
    * driver; past ~1M query×centroid distance computations the ranking
    * fans out to executors so the driver never does O(nq·nlist·d)
    * float work — the coarse step scales in the query dimension like
    * everything else. */
  def rankTop(spark: org.apache.spark.sql.SparkSession,
              model: IVFModel, q: Array[(Long, Array[Float])],
              top: Int): Array[Array[(Int, Float)]] = {
    val t = math.min(top, model.nlist)
    if (q.length.toLong * model.nlist < (1L << 20))
      q.map { case (_, v) => model.rankCentroids(v).take(t) }
    else {
      val bm = spark.sparkContext.broadcast(model)
      val slices = math.max(1, math.min(q.length, 256))
      spark.sparkContext.parallelize(q.toSeq.zipWithIndex, slices)
        .map { case ((_, v), i) => (i, bm.value.rankCentroids(v).take(t)) }
        .collect().sortBy(_._1).map(_._2)
    }
  }

  /** @param ivfData (id LONG, vec ARRAY<FLOAT>, list_no INT) — ideally
    *                read from a `partitionBy("list_no")` Parquet table
    * @param queries (qid LONG, vec ARRAY<FLOAT>)
    * @return (qid, id, dist, rank)
    */
  def search(ivfData: DataFrame, model: IVFModel, queries: DataFrame,
             k: Int, nprobe: Int): DataFrame = {
    val spark = ivfData.sparkSession
    import spark.implicits._

    val q: Array[(Long, Array[Float])] = queries
      .select(col("qid").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // the scan distance uses the SAME normalized vector the ranking
    // does for ip (scores are -dot of unit vectors there)
    val qScan = if (model.metric == "ip")
      q.map { case (qid, v) => (qid, Kernels.l2Normalize(v)) } else q
    val bqv = spark.sparkContext.broadcast(qScan.map(_._2))
    val m = model.metric
    probedTopK[Array[Float]](ivfData,
      df => df.select(col("list_no").cast("int"), col("id").cast("long"),
        col("vec")).as[(Int, Long, Array[Float])],
      model, q, k, nprobe,
      () => (qi, _, vec) => Kernels.distance(m, bqv.value(qi), vec))
  }

  /** Shared probed-list partial-heap scan scaffold for code-based
    * indexes (binary Hamming, spectral hash — the float path above
    * keeps its specialized qvec-broadcast shape): metric-correct
    * coarse ranking (rankTop fan-out), probed-list partition pruning,
    * per-partition bounded heaps scored by `mkScore()(qi, listNo,
    * payload)`, global top-k merge. `mkScore` is invoked once per
    * partition so a scorer can keep lazy per-(query, list) state (e.g.
    * per-list query binarization) without cross-partition sharing.
    * A scorer may return NaN to REJECT a row (the polysemous Hamming
    * filter inside the IVFPQ scan) — rejected rows never enter the
    * heaps, matching the reference's filtered list scan. */
  def probedTopK[R](encoded: DataFrame,
                    toRows: DataFrame => Dataset[(Int, Long, R)],
                    model: IVFModel, q: Array[(Long, Array[Float])],
                    k: Int, nprobe: Int,
                    mkScore: () => (Int, Int, R) => Double): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val np = math.min(nprobe, model.nlist)
    val qRank = q.map { case (qid, v) =>
      (qid, if (model.metric == "ip") Kernels.l2Normalize(v) else v)
    }
    val ranks = rankTop(spark, model, qRank, np)
    val probesByList: Map[Int, Array[Int]] = q.indices.flatMap { qi =>
      ranks(qi).map { case (l, _) => (l, qi) }
    }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }
    val bp = spark.sparkContext.broadcast(probesByList)
    val bqids = spark.sparkContext.broadcast(q.map(_._1))
    val partials = toRows(
      encoded.filter(col("list_no").isin(probesByList.keys.toSeq.sorted: _*)))
      .mapPartitions { it =>
        val pm = bp.value
        val qids = bqids.value
        val score = mkScore()
        val heaps = scala.collection.mutable.HashMap.empty[Int, TopK]
        it.foreach { case (listNo, id, payload) =>
          pm.get(listNo) match {
            case Some(qis) =>
              var i = 0
              while (i < qis.length) {
                val qi = qis(i)
                val s = score(qi, listNo, payload)
                if (!java.lang.Double.isNaN(s))
                  heaps.getOrElseUpdate(qi, new TopK(k)).add(s, id)
                i += 1
              }
            case None =>
          }
        }
        heaps.iterator.flatMap { case (qi, h) =>
          h.sorted.iterator.map { case (d, id) => (qids(qi), id, d) }
        }
      }.toDF("qid", "id", "dist")
    FlatSearch.mergeTopK(partials, k)
  }

  /** IVF range search (`IndexIVF::range_search` semantics over probed
    * lists): all ids within `radius` among the nprobe nearest lists —
    * same partition-pruned scan, no heap (variable-size result). */
  def range(ivfData: DataFrame, model: IVFModel, queries: DataFrame,
            radius: Double, nprobe: Int): DataFrame = {
    val spark = ivfData.sparkSession
    import spark.implicits._
    val q: Array[(Long, Array[Float])] = queries
      .select(col("qid").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val np = math.min(nprobe, model.nlist)
    val qNorm = if (model.metric == "ip")
      q.map { case (qid, v) => (qid, Kernels.l2Normalize(v)) } else q
    val rks = rankTop(spark, model, qNorm, np)
    val probesByList: Map[Int, Array[(Long, Array[Float])]] = qNorm.indices
      .flatMap { i =>
        rks(i).map { case (l, _) => (l, qNorm(i)) }
      }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }
    val bq = spark.sparkContext.broadcast(probesByList)
    val m = model.metric
    ivfData
      .filter(col("list_no").isin(probesByList.keys.toSeq.sorted: _*))
      .select(col("list_no").cast("int"), col("id").cast("long"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .flatMap { case (listNo, id, vec) =>
        bq.value.get(listNo) match {
          case Some(qs) => qs.iterator.flatMap { case (qid, qv) =>
            val d = Kernels.distance(m, qv, vec)
            if (d < radius) Some((qid, id, d)) else None
          }
          case None => Iterator.empty
        }
      }.toDF("qid", "id", "dist")
  }
}
