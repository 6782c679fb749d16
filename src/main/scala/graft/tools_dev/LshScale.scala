package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: embedding near-dup at scale, the production pipeline
  * shape — exact-duplicate pre-pass (8-byte hash shuffle, recall 1.0
  * on identical vectors by construction) THEN capped banded LSH for
  * near-but-not-identical pairs.
  *
  * Standalone app (not a [[ScaleDemo]] section) for two reasons found
  * in the r5 rehearsal: (a) the 30-minute multi-section pipeline
  * accumulates dead-stage shuffle files that fill /tmp, and (b) the
  * TIGHT-cluster demo corpus (σ=0.15) concentrates whole clusters
  * into single band buckets — the B² degenerate case the `maxBucket`
  * cap now bounds. Here the corpus is spread (σ=1.0, realistic for
  * embeddings), with an identical twin planted at every 100th id.
  * run: sbt "runMain graft.tools_dev.LshScale [n]"
  */
object LshScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      // the candidate distinct can carry ~1e9 (a, b) rows on clustered
      // corpora; 32 partitions made each hash-agg task hold tens of
      // millions of keys and OOM an 8g heap — narrower tasks spill sanely
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toInt).getOrElse(10000000)
    val d = 64
    val nClusters = 256
    val gen = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      val c = new scala.util.Random((id % nClusters) * 7919 + 1)
      Array.fill(d)((c.nextGaussian() + 1.0 * r.nextGaussian()).toFloat)
    }
    val baseDF = spark.range(n).toDF("id").withColumn("vec", gen(col("id"))).cache()
    baseDF.count()

    val planted = baseDF.filter(col("id") % 100 === 0)
      .select((col("id") + n).as("id"), col("vec"))
    val dedupIn = baseDF.select(col("id"), col("vec")).unionByName(planted).cache()
    val nPlanted = planted.count()

    // pass 1 — exact duplicates: one hash-keyed shuffle; must find
    // every planted twin regardless of any local density
    var t = System.nanoTime()
    val exact = graft.ops.EmbeddingDedup.exactDupPairs(dedupIn).cache()
    val nExact = exact.count()
    val tExact = (System.nanoTime() - t) / 1e9
    val exactPlanted = exact.filter(col("b") === col("a") + n).count()
    println(f"exact-dup pre-pass (${n + nPlanted} rows): ${tExact}%.1fs, " +
      f"$nExact pairs, planted recall ${exactPlanted.toDouble / nPlanted}%.3f")

    // pass 2 — WIDE banded LSH (128-bit signatures, 4 × 32-bit bands:
    // 4G-key space keeps buckets at collision-survivor size; the
    // 63-bit model's 512-key bands degenerate to all-pairs at 10M).
    // Exact twins agree on every band → LSH-path planted recall 1.0.
    val wide = graft.index.BinaryHash.trainWide(d, nbits = 128, seed = 7L)
    t = System.nanoTime()
    val pairs = graft.ops.EmbeddingDedup.lshPairsWide(dedupIn, wide,
      threshold = 0.999, nBands = 4).cache()
    val nPairs = pairs.count()
    val tLsh = (System.nanoTime() - t) / 1e9
    val foundPlanted = pairs.filter(col("b") === col("a") + n).count()
    println(f"wide banded LSH (${n + nPlanted} rows, 4x32-bit bands, " +
      f"maxBucket=8192): ${tLsh}%.1fs, $nPairs pairs >=0.999, " +
      f"planted recall ${foundPlanted.toDouble / nPlanted}%.3f")
    spark.stop()
  }
}
