package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IVFIndex

/** Dev tool: dump physical plans for the scan-shape-critical paths —
  * verifies PushedFilters / PartitionFilters / WholeStageCodegen reach
  * where they must (run: sbt "runMain graft.tools_dev.ExplainAudit"). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    println("=== q01 filter+projection pushdown ===")
    graft.queries.Relational.q01PricingSummary(spark, dir).explain("formatted")

    println("=== IVF partitioned-table probe pruning ===")
    import spark.implicits._
    val b = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val model = IVFIndex.train(b, nlist = 16)
    val tmp = java.nio.file.Files.createTempDirectory("audit").toString
    IVFIndex.write(IVFIndex.assign(b, model), s"$tmp/ivf")
    val ivf = spark.read.parquet(s"$tmp/ivf")
    ivf.filter(col("list_no").isin(1, 3, 5))
      .select(col("id"), col("vec")).explain("formatted")

    println("=== q02 join strategy (dims broadcast, fact shuffle) ===")
    graft.queries.Relational.q02RevenueByNation(spark, dir).explain("formatted")

    println("=== v07 near-dup: block pair enumeration (no full-collection broadcast) ===")
    graft.queries.Vector.v07NearDupPairs(spark, dir).explain("formatted")

    println("=== v15 LSH near-dup: band equi-join, id-only candidate shuffle ===")
    graft.queries.Vector.v15NeardupLsh(spark, dir).explain("formatted")

    println("=== v19 PQR rerank: candidate broadcast join (no big-side shuffle) ===")
    graft.queries.Vector.v19IvfpqrKnn(spark, dir).explain("formatted")

    println("=== d12 prepare e2e (pre-pack stages): gate fused into scan, md5 dedup shuffle, broadcast gram join, anti-join on hit ids ===")
    val docsDF = spark.read.parquet(s"$dir/documents.parquet")
    graft.ops.PreparePipeline.cleanCorpus(
      docsDF.filter(col("doc_id") % 10 =!= 7),
      docsDF.filter(col("doc_id") % 10 === 7),
      Seq("the", "a", "of", "and", "or", "is", "to", "in"),
      minStopRatio = 0.02, minTokens = 20, gramN = 4).explain("formatted")

    println("=== v32 semantic dedup: within-list equi-join + codegen'd cosine (no cartesian) ===")
    graft.queries.Vector.v32SemanticDedup(spark, dir).explain("formatted")
    spark.stop()
  }
}
