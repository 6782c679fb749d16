package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IVFIndex
import graft.search.{FlatSearch, IVFSearch}

/** Dev tool: the probe-pruning story at a more serious local scale —
  * n × 64-d vectors in a list_no-partitioned parquet table; compare
  * flat scan vs IVF probe (bytes read via partition pruning, time),
  * then the bounded-error flagship.
  * run: sbt "runMain graft.tools_dev.ScaleDemo [n] [nlist]"
  * (defaults 200000 / 256; 1000000 1024 = the reference's IVF1024 config)
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val nlist = if (args.length > 1) args(1).toInt else 256
    val d = 64; val k = 10; val nq = 16
    val dir = java.nio.file.Files.createTempDirectory("scale").toString
    println(s"corpus: $n × $d, nlist=$nlist, out=$dir")

    // distributed seeded generation — nothing driver-side
    val nClusters = 256
    val gen = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      val c = new scala.util.Random((id % nClusters) * 7919 + 1)
      Array.fill(d)((c.nextGaussian() + 0.15 * r.nextGaussian()).toFloat)
    }
    val baseDF = spark.range(n).toDF("id").withColumn("vec", gen(col("id"))).cache()
    baseDF.count()

    var t = System.nanoTime()
    val model = IVFIndex.train(baseDF.sample(0.25, 42L), nlist)
    println(f"kmeans train (${n / 4} sample): ${(System.nanoTime() - t) / 1e9}%.1fs")

    t = System.nanoTime()
    IVFIndex.write(IVFIndex.assign(baseDF, model), s"$dir/ivf")
    println(f"assign+write partitioned: ${(System.nanoTime() - t) / 1e9}%.1fs")

    // flat baseline reads unpartitioned parquet — same storage medium
    baseDF.write.mode("overwrite").parquet(s"$dir/flat")
    val flatTbl = spark.read.parquet(s"$dir/flat")
    val ivf = spark.read.parquet(s"$dir/ivf")
    val queries = baseDF.limit(nq).select(col("id").as("qid"), col("vec"))

    t = System.nanoTime()
    val flat = FlatSearch.knn(flatTbl, queries, k)
    flat.count()
    val tFlat = (System.nanoTime() - t) / 1e9

    for (np <- Seq(8, 16, 32)) {
      t = System.nanoTime()
      val r = IVFSearch.search(ivf, model, queries, k, np)
      r.count()
      val tIvf = (System.nanoTime() - t) / 1e9
      // recall vs flat
      val exact = flat.select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = r.select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rec = exact.map { case (q, ids) =>
        (got.getOrElse(q, Set.empty) & ids).size.toDouble / k }.sum / exact.size
      println(f"nprobe=$np%3d: ${tIvf}%.2fs (flat ${tFlat}%.2fs, ${tFlat / tIvf}%.1fx) recall=$rec%.3f")
    }

    // flagship at scale: error-bounded adaptive search over the
    // partitioned table (profile trained on 200 held-out queries)
    import graft.profile.ProfileTrainer
    import graft.search.BoundedSearch
    val trainQ = baseDF.orderBy(col("id").desc).limit(200)
      .select(col("id").as("qid"), col("vec"))
    t = System.nanoTime()
    val gt = FlatSearch.knn(flatTbl, trainQ, k)
    val traces = ProfileTrainer.train(ivf, model, trainQ, gt, k)
    println(f"profile training (200 queries): ${(System.nanoTime() - t) / 1e9}%.1fs")
    val evalQ = queries.withColumn("required_recall", lit(0.9f))
    t = System.nanoTime()
    val res = BoundedSearch.search(ivf, model, traces, evalQ, k,
      multiplier = 4.0f, stdM = 1.0f)
    res.results.count()
    val tB = (System.nanoTime() - t) / 1e9
    val probes = res.stats.map(_.nprobeUsed)
    val exact = flat.select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = res.results.select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rec = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size.toDouble / k }.toSeq
    println(f"bounded search (req 0.9, $nq queries): ${tB}%.2fs, " +
      f"mean nprobe ${probes.sum.toDouble / probes.size}%.1f/$nlist, " +
      f"recall mean ${rec.sum / rec.size}%.3f min ${rec.min}%.3f")

    // throughput: a real batch (1000 queries) amortizes the fixed
    // staged-rounds job overhead — report per-query amortized latency
    val bigQ = baseDF.filter(col("id") % 997 === 0).limit(1000)
      .select(col("id").as("qid"), col("vec"))
      .withColumn("required_recall", lit(0.9f))
    val nBig = bigQ.count()
    t = System.nanoTime()
    val resBig = BoundedSearch.search(ivf, model, traces, bigQ, k,
      multiplier = 4.0f, stdM = 1.0f)
    resBig.results.count()
    val tBig = (System.nanoTime() - t) / 1e9
    val pBig = resBig.stats.map(_.nprobeUsed)
    println(f"bounded search batch ($nBig queries): ${tBig}%.2fs = " +
      f"${tBig * 1000 / nBig}%.1f ms/query amortized, " +
      f"mean nprobe ${pBig.sum.toDouble / pBig.size}%.1f/$nlist")
    spark.stop()
  }
}
