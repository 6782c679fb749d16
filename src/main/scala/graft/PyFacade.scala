package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.{IVFIndex, IVFModel, IVFPQ}
import graft.profile.{ErrorProfile, ProfileTrainer}
import graft.quantize.PQModel
import graft.search.{BoundedSearch, FlatSearch, IVFSearch}

/** py4j-friendly facade behind `python/graft.py` — the Python module
  * that mirrors the reference's tutorial idiom (`index = IndexFlatL2(d);
  * index.add(xb); D, I = index.search(xq, k)`,
  * `Auncel/tutorial/python/1-Flat.py:19-28`, `2-IVFFlat.py:21-35`,
  * `3-IVFPQ.py:21-33`).
  *
  * Every method here takes only py4j-trivial types (DataFrame, Int,
  * Long, Float, String) or an opaque model handle the Python side
  * passes back verbatim — no default args, no Option, no Scala
  * collections — because py4j cannot synthesize Scala defaults or
  * implicits. The methods are one-line delegations; all semantics live
  * in the real operators.
  */
object PyFacade {

  /** Brute-force top-k ([[FlatSearch.knn]]): base (id, vec), queries
    * (qid, vec) → (qid, id, dist, rank). `metric` "l2" (squared) or
    * "ip" (dist = NEGATED inner product — the Python wrapper flips the
    * sign back to the reference's raw-IP convention). */
  def flatSearch(base: DataFrame, queries: DataFrame, k: Int,
                 metric: String): DataFrame =
    FlatSearch.knn(base, queries, k, metric)

  def trainIvf(df: DataFrame, nlist: Int, metric: String,
               seed: Long): IVFModel =
    IVFIndex.train(df, nlist, metric, seed)

  def assign(df: DataFrame, model: IVFModel): DataFrame =
    IVFIndex.assign(df, model)

  def ivfSearch(assigned: DataFrame, model: IVFModel, queries: DataFrame,
                k: Int, nprobe: Int): DataFrame =
    IVFSearch.search(assigned, model, queries, k, nprobe)

  def trainPq(assigned: DataFrame, model: IVFModel, m: Int, nbits: Int,
              seed: Long): PQModel =
    IVFPQ.trainResidualPQ(assigned, model, m, nbits, seed)

  def encodePq(assigned: DataFrame, model: IVFModel, pq: PQModel): DataFrame =
    IVFPQ.encode(assigned, model, pq)

  def ivfpqSearch(encoded: DataFrame, model: IVFModel, pq: PQModel,
                  queries: DataFrame, k: Int, nprobe: Int): DataFrame =
    IVFPQ.search(encoded, model, pq, queries, k, nprobe,
      precomputed = Some(IVFPQ.precomputeTable(model, pq)))

  /** Train the error profile for bounded search on held-out training
    * queries (qid, vec); ground truth is computed here with the exact
    * brute-force search, exactly as the a01 driver row does. The
    * returned handle is opaque to Python — pass it to
    * [[boundedSearch]]. */
  def trainProfile(assigned: DataFrame, model: IVFModel,
                   trainQueries: DataFrame, maxTopk: Int,
                   bs: Int): Array[ErrorProfile.Trace] = {
    val gt = FlatSearch.knn(assigned, trainQueries, maxTopk, model.metric)
    ProfileTrainer.train(assigned, model, trainQueries, gt, maxTopk, bs)
  }

  /** Error-bounded adaptive search: every query gets the SAME
    * required recall (the tutorial shape; per-query bounds are one
    * withColumn away in pyspark). Returns `[results, stats]` — the
    * (qid, id, dist, rank) frame and the per-query
    * (qid, nprobeUsed, …) decision stats — as a 2-element array so one
    * call never runs the search twice. */
  def boundedSearch(assigned: DataFrame, model: IVFModel,
                    traces: Array[ErrorProfile.Trace], queries: DataFrame,
                    k: Int, requiredRecall: Float, multiplier: Float,
                    stdM: Float): Array[DataFrame] = {
    val res = BoundedSearch.search(assigned, model, traces,
      queries.withColumn("required_recall", lit(requiredRecall)), k,
      multiplier, stdM)
    Array(res.results, queries.sparkSession.createDataFrame(res.stats))
  }
}
