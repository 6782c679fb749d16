package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.index.{IVFIndex, IVFModel}

/** Index data-management operators (`Auncel/IndexIVF.cpp:869-1113`,
  * `MetaIndexes.h`, `IVFlib.h`): deletes, reconstruction, merge/split,
  * id remapping, dimension splits, sliding-window retention — all plain
  * DataFrame rewrites; listed here so the operator inventory has one
  * audited home.
  */
object Management {

  /** O16 — delete by id selector (`IndexIVF::remove_ids`,
    * `AuxIndexStructures.h:54-101`): range and batch selectors are
    * predicates; the "compaction" is a partition overwrite on write. */
  def removeIdsRange(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.filter(!(col("id") >= lo && col("id") < hi))

  def removeIdsBatch(df: DataFrame, ids: Seq[Long]): DataFrame =
    df.filter(!col("id").isin(ids: _*))

  /** Anti-join form for large delete sets (distributed, no driver list). */
  def removeIds(df: DataFrame, ids: DataFrame): DataFrame =
    df.join(ids.select(col("id")), Seq("id"), "left_anti")

  /** O17 — reconstruct vectors by id (`IndexIVF::reconstruct[_n]`):
    * the direct map is just the id column. */
  def reconstruct(df: DataFrame, ids: Seq[Long]): DataFrame =
    df.filter(col("id").isin(ids: _*)).select(col("id"), col("vec"))

  /** O17 — search_and_reconstruct: join results back to the vectors. */
  def searchAndReconstruct(results: DataFrame, df: DataFrame): DataFrame =
    results.join(df.select(col("id"), col("vec")), Seq("id"))
      .select(col("qid"), col("id"), col("dist"), col("rank"), col("vec"))

  /** O18 — merge two collections with id offsetting
    * (`IndexIVF::merge_from` add_id semantics). */
  def mergeFrom(a: DataFrame, b: DataFrame, addId: Long = 0L): DataFrame =
    a.unionByName(b.withColumn("id", col("id") + addId))

  /** O18 — copy_subset_to (`IndexIVF.cpp:1055-1113`): subset_type 0 =
    * id range, 1 = id mod, 2 = list range. */
  def copySubsetIdRange(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.filter(col("id") >= lo && col("id") < hi)

  def copySubsetIdMod(df: DataFrame, mod: Long, rem: Long): DataFrame =
    df.filter(pmod(col("id"), lit(mod)) === rem)

  def copySubsetListRange(df: DataFrame, lo: Int, hi: Int): DataFrame =
    df.filter(col("list_no") >= lo && col("list_no") < hi)

  /** O22 — external-id remapping (`IndexIDMap`): a broadcast join with
    * the mapping table. */
  def idMap(results: DataFrame, mapping: DataFrame): DataFrame =
    results
      .join(broadcast(mapping.select(col("id"), col("ext_id"))), Seq("id"))
      .select(col("qid"), col("ext_id").as("id"), col("dist"), col("rank"))

  /** O23 — vertical split across sub-dimensions (`IndexSplitVectors`):
    * slice the vector column into per-block tables. */
  def splitDims(df: DataFrame, blocks: Int): Seq[DataFrame] = {
    import df.sparkSession.implicits._
    val d = df.select(size(col("vec"))).as[Int].head()
    val per = d / blocks
    (0 until blocks).map { b =>
      df.withColumn("vec", slice(col("vec"), b * per + 1, per))
    }
  }

  /** O19 — sliding window over time-partitioned sub-indexes
    * (`SlidingIndexWindow`, `IVFlib.h:83-106`): keep the last `w`
    * ingest batches; with the table partitioned by `batch_id` this is
    * partition pruning + an overwrite to drop old partitions. */
  def slidingWindow(df: DataFrame, currentBatch: Long, w: Int): DataFrame =
    df.filter(col("batch_id") > currentBatch - w)

  /** O21 — replicated search (`IndexReplicas.h:21-74`): round-robin the
    * query batch over `nReplicas` identical copies of the collection —
    * a throughput scheduling concern; here the router that assigns each
    * query its replica, so each replica's scan handles 1/n of the batch. */
  def routeReplicas(queries: DataFrame, nReplicas: Int): Seq[DataFrame] =
    (0 until nReplicas).map { r =>
      queries.filter(pmod(col("qid"), lit(nReplicas)) === r)
    }

  /** O13 — recall@k of results vs a ground-truth table (both
    * (qid, id, rank ≤ k)); `Auncel/profile.cpp:246-280`. */
  def recallAtK(results: DataFrame, gt: DataFrame, k: Int): DataFrame = {
    val r = results.filter(col("rank") <= k).select(col("qid"), col("id"))
    val g = gt.filter(col("rank") <= k).select(col("qid"), col("id"),
      lit(1).as("hit"))
    // left join from results so a query with zero true hits still reports
    // recall 0.0 (an inner join would silently drop it, inflating means)
    r.join(g, Seq("qid", "id"), "left")
      .groupBy(col("qid"))
      .agg((sum(coalesce(col("hit"), lit(0))) / k.toDouble).as("recall"))
  }

  /** O13 — distance-threshold intersection recall (`inter_sec`,
    * `Auncel/eval/bound.cpp:117-128`): fraction of returned dists within
    * the GT k-th distance × (1+ε_tol). */
  def distanceRecall(results: DataFrame, gtKth: DataFrame, k: Int,
                     tol: Double = 5e-4): DataFrame =
    results.join(broadcast(gtKth.select(col("qid"), col("kth_dist"))), Seq("qid"))
      .groupBy(col("qid"))
      .agg((sum(when(col("dist") <= col("kth_dist") * (1 + tol), 1)
        .otherwise(0)) / k.toDouble).as("recall"))
}
