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

  def ivf(key: String, df: => DataFrame, nlist: Int, metric: String = "l2",
          seed: Long = 42L): (IVFModel, DataFrame) =
    models.computeIfAbsent(s"$key|$nlist|$metric|$seed", { _ =>
      val model = IVFIndex.train(df, nlist, metric, seed)
      val assigned = IVFIndex.assign(df, model).cache()
      assigned.count()
      (model, assigned)
    })

  def clear(): Unit = models.clear()
}
