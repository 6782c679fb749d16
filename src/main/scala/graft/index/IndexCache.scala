package graft.index

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame

/** Session-lifetime cache of trained IVF models + assigned tables,
  * keyed by (source dir, nlist, metric, seed): an index is built once
  * and queried many times — re-training per query would charge k-means
  * to every search (the reference likewise persists indexes via
  * `write_index`, `Auncel/eval/bound.cpp:265-268`). */
object IndexCache {
  private val models = new ConcurrentHashMap[String, (IVFModel, DataFrame)]()
  private val graphs = new ConcurrentHashMap[String, DataFrame]()
  private val traces =
    new ConcurrentHashMap[String, Array[graft.profile.ErrorProfile.Trace]]()

  def ivf(key: String, df: => DataFrame, nlist: Int, metric: String = "l2",
          seed: Long = 42L): (IVFModel, DataFrame) =
    models.computeIfAbsent(s"$key|$nlist|$metric|$seed", { _ =>
      val model = IVFIndex.train(df, nlist, metric, seed)
      val assigned = IVFIndex.assign(df, model).cache()
      assigned.count()
      (model, assigned)
    })

  /** Built-once HNSW adjacency (see [[HNSW.buildGraph]]) — search jobs
    * pay beam search, never graph construction. */
  def hnsw(key: String, df: => DataFrame, nParts: Int = 8, m: Int = 16,
           efConstruction: Int = 64): DataFrame =
    graphs.computeIfAbsent(s"$key|hnsw|$nParts|$m|$efConstruction", { _ =>
      val g = HNSW.buildGraph(df, nParts, m, efConstruction).cache()
      g.count()
      g
    })

  /** Trained error-profile traces are model artifacts exactly like the
    * centroids (the reference persists profile + index between train
    * and search phases, `Auncel/eval/bound.cpp:265-268`) — bounded
    * search pays trace lookup, not profile training. */
  def profileTraces(key: String, train: => Array[graft.profile.ErrorProfile.Trace])
      : Array[graft.profile.ErrorProfile.Trace] =
    traces.computeIfAbsent(key, _ => train)

  /** Generic built-once cached DataFrame (e.g. MinHash signature
    * tables shared across the dedup pipeline's queries). */
  def frame(key: String, build: => DataFrame): DataFrame =
    frames.computeIfAbsent(key, { _ =>
      val df = build.cache()
      df.count()
      df
    })

  private val frames = new ConcurrentHashMap[String, DataFrame]()

  def clear(): Unit = {
    models.clear(); graphs.clear(); traces.clear(); frames.clear()
  }
}
