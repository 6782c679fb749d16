package graft.search

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Kernels, VectorFunctions}
import graft.operators.TopK

/** Exact brute-force k-NN / range search over a vector DataFrame.
  *
  * Spark-first re-expression of the reference's flat scan
  * (`Auncel/IndexFlat.cpp:41-56`, kernels `Auncel/utils.cpp:417-655`):
  * the query batch is broadcast to every partition, each partition keeps
  * a bounded per-query top-k heap (map-side combine — shuffle volume is
  * `#partitions × nq × k`, never `N × nq`), and the global merge is a
  * window rank per query. At 100 TB the scan parallelizes per-partition
  * with no data shuffle at all; only the tiny partial-topk rows move.
  */
object FlatSearch {

  /** Brute-force top-k.
    *
    * @param base    (id LONG, vec ARRAY<FLOAT>) — arbitrarily large
    * @param queries (qid LONG, vec ARRAY<FLOAT>) — driver-collectable
    * @return (qid, id, dist, rank) with rank 1..k by (dist, id) asc;
    *         dist is squared-L2 for "l2", negated inner product for "ip"
    */
  def knn(base: DataFrame, queries: DataFrame, k: Int,
          metric: String = "l2", forceDistributed: Boolean = false): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._

    if (forceDistributed) return knnLarge(base, queries, k, metric)
    // single-job guard: collect AT MOST the driver contract + 1 rows —
    // small batches pay exactly the one collect they always did, and a
    // >131k batch bails to the query-DataFrame-resident path after
    // materializing only the bounded prefix (~36 MB at d=64), never nq
    val qRaw: Array[(Long, Array[Float])] = queries
      .select(col("qid").cast("long"), col("vec"))
      .limit(DistributedMinQueries + 1)
      .as[(Long, Array[Float])].collect()
    if (qRaw.length > DistributedMinQueries)
      return knnLarge(base, queries, k, metric)
    val q = qRaw.sortBy(_._1)
    val bq = spark.sparkContext.broadcast(q)
    val m = metric

    val partials: Dataset[(Long, Long, Double)] = base
      .select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        val heaps = qs.map(_ => new TopK(k))
        it.foreach { case (id, vec) =>
          var i = 0
          while (i < qs.length) {
            val d = Kernels.distance(m, qs(i)._2, vec)
            heaps(i).add(d, id)
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          h.sorted.iterator.map { case (d, id) => (qs(i)._1, id, d) }
        }
      }

    mergeTopK(partials.toDF("qid", "id", "dist"), k)
  }

  /** The reference's own driver contract holds all queries in RAM
    * (`Auncel/dist/worker.cpp` serves batches from memory); past this
    * size we keep the query batch in a DataFrame instead
    * ([[knnLarge]]) — same threshold as BoundedSearch's distributed
    * routing ([[graft.GraftConf.distributedMinQueries]]). */
  private def DistributedMinQueries = graft.GraftConf.distributedMinQueries

  /** Query-DataFrame-resident brute force for batches past the driver
    * contract — the flat twin of BoundedSearch's fully-distributed path
    * (reference parity: `Auncel/dist/worker.cpp:141-325` serves every
    * search kind at any batch size). Shape: block-cartesian of base ×
    * query partitions (the nq × N distance work is inherent to exact
    * search), the codegen'd distance kernel scores pairs inside
    * WholeStageCodegen, and a per-task (qid → k-heap) combine bounds
    * the shuffle to tasks × k rows per query. No per-query structure
    * ever exists on the driver. */
  def knnLarge(base: DataFrame, queries: DataFrame, k: Int,
               metric: String = "l2"): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val q = queries.select(col("qid").cast("long").as("qid"),
      col("vec").as("qvec"))
    val b = base.select(col("id").cast("long").as("id"), col("vec"))
    val dist =
      if (metric == "ip") negate(VectorExpressions.dot(col("qvec"), col("vec")))
      else VectorExpressions.l2Sqr(col("qvec"), col("vec"))
    val scored = b.crossJoin(q)
      .select(col("qid"), col("id"), dist.as("dist"))
    mergeTopK(partialTopK(scored, k), k)
  }

  /** Per-task bounded-heap combine over scored (qid, id, dist) rows —
    * the map-side-combine half of the partial-topk pattern, factored so
    * the cartesian/join-shaped scans (knnLarge, Hamming large batches)
    * share it. */
  private[graft] def partialTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("qid").cast("long"), col("id").cast("long"),
        col("dist").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap.empty[Long, TopK]
        it.foreach { case (qid, id, d) =>
          heaps.getOrElseUpdate(qid, new TopK(k)).add(d, id)
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.sorted.iterator.map { case (d, id) => (qid, id, d) }
        }
      }.toDF("qid", "id", "dist")
  }

  /** Global top-k merge of per-partition (or per-shard) partial results —
    * the Spark form of `Auncel/dist/reduce.cpp:98-119`'s sorted merge. */
  def mergeTopK(partials: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    partials.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("dist"), col("rank"))
  }

  /** k-NN restricted to an id subset (`Auncel/IndexFlat.cpp:72-91`,
    * `knn_*_by_idx` `utils.cpp:729-792`): a pushed-down semi-join then
    * the same partial-topk scan. */
  def knnSubset(base: DataFrame, queries: DataFrame, k: Int,
                ids: DataFrame, metric: String = "l2"): DataFrame =
    knn(base.join(ids.select(col("id")).distinct(), Seq("id"), "left_semi"),
      queries, k, metric)

  /** Range search (`Auncel/Index.h:146-147`, flat impl
    * `utils.cpp:944-1030`): all ids with dist below `radius` (L2) —
    * fully declarative, stays in WholeStageCodegen end-to-end. */
  def range(base: DataFrame, queries: DataFrame, radius: Double,
            metric: String = "l2"): DataFrame = {
    val qs = broadcast(queries.select(col("qid"), col("vec").as("qvec")))
    base.select(col("id"), col("vec"))
      .crossJoin(qs)
      .withColumn("dist", VectorFunctions.distance(metric, col("qvec"), col("vec")))
      .filter(col("dist") < lit(radius))
      .select(col("qid"), col("id"), col("dist"))
  }
}
