package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` for named inventory queries
  * to files (the plans/rN/ judge evidence).
  *
  * Usage: sbt "runMain graft.tools_dev.PlanDump <outDir> <suffix> <query...>"
  * writes <outDir>/<query>_<suffix>.txt for each query. Env:
  * SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  * The query function runs once first (some rows build artifacts or
  * run iterative loops whose RESULT frame is the explainable plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names =
      if (args(2) == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
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
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      df.collect() // build artifacts / run iterative loops once
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
