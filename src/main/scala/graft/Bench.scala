package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the query inventory on
  * SPARK_GRAFT_SF_DIR at local[N] and prints ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}.
  *
  * Each query is materialized with collect() (results are small by
  * construction) so column pruning can't hide work the way count()
  * would. One warmup action first so JVM/codegen startup isn't billed
  * to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + codegen + parquet footer caches, covering the three
    // execution shapes (agg scan, window+mapPartitions vector search,
    // string pipeline) so the first timed query isn't billed for JIT
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.entry(spark).collect()
    Seq("v01_knn_flat", "t06_rolling_fp", "q03_top_orders_per_cust").foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).collect()
      catch { case _: Throwable => }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).collect() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
