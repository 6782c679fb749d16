package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev plan dump for the PreparePipeline dedup chain: the declared
  * d12/d13 rows end in packOffsets' RDD-backed frame, which hides the
  * upstream join strategies from their `.explain` — this dumps the
  * CLEANCORPUS (pre-pack) plan for both the plain (d12) and fuzzy
  * (d13) shapes, where the size-gated materialization is visible
  * (fuzzy: survivors scan from a LogicalRDD snapshot; plain: the
  * re-scan join tree).
  *
  * Usage: sbt "runMain graft.tools_dev.CleanCorpusPlan <outDir> <suffix>"
  */
object CleanCorpusPlan {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CleanCorpusPlan <outDir> <suffix>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
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
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val D = graft.queries.Documents
    val base = graft.ops.PreparePipeline.Config(
      stopwords = Seq("the", "a", "of", "and", "or", "is", "to", "in"),
      minStopRatio = 0.02, minTokens = 20, gramN = D.DecontamN,
      windowTokens = D.PackWindow)
    val planted = d.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
    val shapes = Seq(
      ("d12_cleanCorpus",
        graft.ops.PreparePipeline.cleanCorpus(
          d.filter(col("doc_id") % 10 =!= D.BenchResidue),
          d.filter(col("doc_id") % 10 === D.BenchResidue), base)),
      ("d13_cleanCorpus_fuzzy",
        graft.ops.PreparePipeline.cleanCorpus(
          corpus.filter(col("doc_id") % 10 =!= D.BenchResidue),
          corpus.filter(col("doc_id") % 10 === D.BenchResidue),
          base.copy(fuzzy = Some(graft.ops.PreparePipeline.FuzzyDedup(
            numHashes = 16, bands = 4,
            minJaccard = D.FuzzyMinJaccard))))))
    shapes.foreach { case (name, df) =>
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = outDir.resolve(s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(f, txt)
      println(s"[cleancorpusplan] wrote ${f.getFileName} (${txt.length} chars)")
    }
    spark.stop()
  }
}
