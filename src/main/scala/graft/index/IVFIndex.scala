package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** IVF (inverted-file) index model: the trained coarse quantizer.
  *
  * Spark-first re-expression of the reference's `IndexIVF` train/add
  * (`Auncel/IndexIVF.cpp:71-137,252-302`, k-means `Clustering.cpp:77-240`):
  * centroids come from MLlib KMeans; "inverted lists" are a Parquet table
  * partitioned by `list_no`, so probing nprobe lists is Catalyst
  * partition pruning (`WHERE list_no IN (...)`) — the Spark analog of
  * reading only the probed posting lists.
  *
  * @param metric    "l2" (squared-L2 coarse dists) or "ip" (vectors and
  *                  centroids L2-normalized; coarse dists are angles,
  *                  mirroring `Auncel/IndexIVF.cpp:101-110`)
  * @param centroids nlist × d row-major
  */
case class IVFModel(metric: String, centroids: Array[Array[Float]])
    extends Serializable {
  val nlist: Int = centroids.length
  val dim: Int = centroids.headOption.map(_.length).getOrElse(0)

  /** Condensed upper-triangular inter-centroid distances, float —
    * exactly `fvec_inter_vecs[_IP]` (`Auncel/IVF_pro.cpp:21-39`) with the
    * same indexing `(2n-1-i)i/2 + j-1-i`; for "ip" the values are
    * arccos'd (`Auncel/IndexIVF.cpp:108-110`). */
  lazy val interdis: Array[Float] = {
    val n = nlist
    val out = new Array[Float](n * (n - 1) / 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val idx = (2 * n - 1 - i) * i / 2 + j - 1 - i
        out(idx) =
          if (metric == "l2") Kernels.l2Sqr(centroids(i), centroids(j)).toFloat
          else math.acos(math.max(-1.0, math.min(1.0,
            Kernels.dot(centroids(i), centroids(j))))).toFloat
        j += 1
      }
      i += 1
    }
    out
  }

  def interdisAt(i: Int, j: Int): Float = {
    require(i != j)
    val (a, b) = if (i < j) (i, j) else (j, i)
    interdis((2 * nlist - 1 - a) * a / 2 + b - 1 - a)
  }

  /** All centroids ranked by closeness to `vec`, with coarse distances —
    * the coarse quantizer search (`Auncel/IndexIVF.cpp:344,364`).
    * For "l2": squared L2 asc; for "ip": angle (arccos of dot) asc. */
  def rankCentroids(vec: Array[Float]): Array[(Int, Float)] = {
    val ds = new Array[(Int, Float)](nlist)
    var i = 0
    while (i < nlist) {
      val d =
        if (metric == "l2") Kernels.l2Sqr(vec, centroids(i)).toFloat
        else math.acos(math.max(-1.0, math.min(1.0,
          Kernels.dot(vec, centroids(i))))).toFloat
      ds(i) = (i, d)
      i += 1
    }
    ds.sortBy { case (id, d) => (d, id) }
  }

  def assignListNo(vec: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < nlist) {
      val d =
        if (metric == "l2") Kernels.l2Sqr(vec, centroids(i))
        else -Kernels.dot(vec, centroids(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }
}

object IVFIndex {

  /** Train the coarse quantizer with MLlib KMeans (niter=25 mirrors
    * `Auncel/Clustering.h:25`). For "ip" the input is L2-normalized first
    * (spherical k-means post-normalization per `Clustering.cpp:63-75`). */
  def train(df: DataFrame, nlist: Int, metric: String = "l2",
            seed: Long = 42L, vecCol: String = "vec"): IVFModel = {
    val toVec = udf { a: Seq[Float] =>
      val arr = if (metric == "ip") Kernels.l2Normalize(a.toArray) else a.toArray
      Vectors.dense(arr.map(_.toDouble))
    }
    val feat = df.select(toVec(col(vecCol)).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(25)
      .setFeaturesCol("features")
    val model = km.fit(feat)
    val cents = model.clusterCenters.map { v =>
      val a = v.toArray.map(_.toFloat)
      if (metric == "ip") Kernels.l2Normalize(a) else a
    }
    IVFModel(metric, cents)
  }

  /** Assign each row its inverted list (`IndexIVF::add_with_ids`,
    * `Auncel/IndexIVF.cpp:252-302`): adds `list_no`; for "ip" also
    * rewrites `vec` L2-normalized (the reference normalizes on ingest for
    * the IP/angle path). */
  def assign(df: DataFrame, model: IVFModel, vecCol: String = "vec"): DataFrame = {
    val bm = df.sparkSession.sparkContext.broadcast(model)
    val assignU = udf { a: Seq[Float] => bm.value.assignListNo(a.toArray) }
    val normU = udf { a: Seq[Float] => Kernels.l2Normalize(a.toArray) }
    val withVec = if (model.metric == "ip")
      df.withColumn(vecCol, normU(col(vecCol))) else df
    withVec.withColumn("list_no", assignU(col(vecCol)))
  }

  /** Write the inverted-file table partitioned by list — probes become
    * partition-pruned scans. The repartition co-locates each list into
    * one task so each `list_no=` directory holds ONE file; without it,
    * `partitionBy` fans every input task across every list
    * (tasks × nlist tiny files — the classic small-files trap). */
  def write(assigned: DataFrame, path: String): Unit =
    assigned.repartition(col("list_no"))
      .write.mode("overwrite").partitionBy("list_no").parquet(path)

  /** Write the inverted-file table BUCKETED by `list_no` (managed table,
    * `bucketBy` is saveAsTable-only). On a bucketed table the
    * fully-distributed bounded search scans lists via a bucket-local
    * join — the per-round data-side shuffle drops out entirely
    * ([[graft.search.BoundedSearch]] `scanListsJoin`). The repartition
    * uses the same Murmur3 hash partitioning as the bucket layout, so
    * each task holds exactly one bucket → ONE sorted file per bucket
    * (which also lets the bucket-local cogroup skip the data-side
    * sort when the scan can report its ordering).
    *
    * `nBuckets` sets the SCAN-TASK granularity of every future join —
    * it is a layout knob, NOT nlist: the list→bucket mapping is
    * many-to-one and harmless to the join. Size buckets ≥ ~100 MB;
    * nBuckets = nlist on a 10M corpus produced 2.5 MB buckets and the
    * per-round stages drowned in task overhead (measured 2.6× SLOWER
    * than the cogroup despite 7 GiB less shuffle — NOTES_r7).
    * Overwrite replaces a REGISTERED table; with the default in-memory
    * catalog an orphaned warehouse directory from a previous session
    * must be dropped first (LOCATION_ALREADY_EXISTS). */
  def writeBucketed(assigned: DataFrame, table: String, nBuckets: Int): Unit =
    assigned.repartition(nBuckets, col("list_no"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "list_no").sortBy("list_no")
      .saveAsTable(table)

  /** Memory-resident serving layout: the assigned corpus repartitioned
    * on `list_no` and cached, so the distributed bounded search's
    * per-round list scan is an Exchange-free bucket-local fused cogroup
    * ([[graft.search.BoundedSearch]] detects the distribution via the
    * cached plan's HashPartitioning) — the deployment where index
    * shards live hot in executor memory, as the reference's distributed
    * workers hold their inverted lists resident (`dist/worker.cpp`).
    * The cache plan is built with AQE off: an adaptive cached plan
    * reports UnknownPartitioning to consumers, which would silently
    * re-add the per-round data-side shuffle this layout exists to
    * remove. The caller must trigger materialization (any action) and
    * owns `unpersist()`. */
  def residentByList(assigned: DataFrame, nParts: Int): DataFrame = {
    val spark = assigned.sparkSession
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // sortWithinPartitions gives each cached batch a tight
      // [min,max] list_no stat, so small/skewed probe sets prune
      // batches; SortExec forwards the child's HashPartitioning, so
      // the Exchange-free join detection is unaffected
      val mem = assigned.repartition(nParts, col("list_no"))
        .sortWithinPartitions("list_no").cache()
      mem.count() // materialize while the non-adaptive plan is pinned
      mem
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  def saveModel(model: IVFModel, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c, model.metric) }.toSeq
      .toDF("list_no", "centroid", "metric")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(path: String, spark: SparkSession): IVFModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("list_no"), col("centroid"), col("metric"))
      .as[(Int, Array[Float], String)].collect().sortBy(_._1)
    IVFModel(rows.head._3, rows.map(_._2))
  }
}
