package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the cluster-resolution
  * step that turns pairwise near-dup candidates (MinHash/LSH, SimHash
  * banding, embedding buckets) into disjoint duplicate CLUSTERS, so a
  * dedup pass can keep exactly one representative per cluster. The
  * reference engine stops at pairwise candidates; a production
  * training-data pipeline needs the transitive closure (A≈B, B≈C ⇒
  * {A,B,C} is one cluster even when A,C never shared a bucket).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * and its neighbors' labels; at fixpoint each node carries the min
  * node id of its component. Rounds needed = component diameter —
  * near-dup clusters are dense and tiny (duplicates of one document
  * pair with each other), so this converges in 2–4 rounds in practice;
  * `maxIter` guards the pathological chain graph, and the return is
  * exact whenever the fixpoint was reached (asserted by the caller via
  * [[ComponentsResult.converged]]).
  *
  * Scale shape: per round, one shuffle join of the (symmetrized) edge
  * table against the label table on node id plus a groupBy-min — both
  * partition by the same key, and AQE handles skewed hub nodes. Each
  * round's label table is `localCheckpoint`ed: persist() alone caches
  * DATA but leaves the LOGICAL plan growing — `labels` appears twice
  * per round, so the plan doubles each iteration and the driver dies
  * in plan analysis long before any executor works (observed as an
  * explain-string OOM at ~8 rounds; the checkpoint truncates the plan
  * to the materialized RDD). localCheckpoint trades recomputability
  * for speed: on a fault-tolerant cluster run, pass `checkpointDir`
  * to use reliable `checkpoint()` instead — a lost executor then
  * re-reads the round's labels from the checkpoint store rather than
  * forcing a job restart. Never collects anything but the per-round
  * convergence flag (one scalar job).
  */
object Components {

  /** @param labels   (node LONG, component LONG) for every node that
    *                 appears in `edges`
    * @param converged whether a fixpoint was reached within maxIter
    *                 (false ⇒ labels are an upper bound, not exact)
    * @param rounds   propagation rounds actually run */
  case class ComponentsResult(labels: DataFrame, converged: Boolean,
                              rounds: Int)

  /** Connected components of the undirected graph given by `edges`
    * (columns `a`, `b`, one row per edge; direction ignored). Nodes not
    * present in any edge are absent from the result — union your full
    * id domain with `component = id` for singleton semantics.
    *
    * @param checkpointDir when set, per-round label tables take a
    *                      reliable eager `checkpoint()` into this
    *                      directory (registered via
    *                      `sparkContext.setCheckpointDir`) instead of
    *                      `localCheckpoint()` — the fault-tolerant
    *                      cluster mode the object doc describes.
    *                      Labels are identical on both paths; only the
    *                      storage of the per-round snapshot differs. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          checkpointDir: Option[String] = None): ComponentsResult = {
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    // eager either way: materializes AND truncates the plan
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val sym = edges.select(col("a").cast("long").as("x"), col("b").cast("long").as("y"))
      .union(edges.select(col("b").cast("long").as("x"), col("a").cast("long").as("y")))
      .persist()
    var labels = snap(sym.select(col("x").as("node")).distinct()
      .select(col("node"), col("node").as("component")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node's best neighbor label this round
      val nbrMin = sym.join(labels, sym("y") === labels("node"))
        .groupBy(col("x")).agg(min(col("component")).as("nbr"))
      val next = snap(labels.join(nbrMin, labels("node") === nbrMin("x"), "left")
        .select(col("node"), col("component").as("old"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component")))
      converged = next.filter(col("component") < col("old")).isEmpty
      labels = next.select(col("node"), col("component"))
      iter += 1
    }
    sym.unpersist()
    ComponentsResult(labels, converged, iter)
  }
}
