package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: scale evidence for the r13 pipeline additions.
  *
  * `pack N` — SequencePack.packOffsets over N synthetic (id, tokens)
  * rows at P=256: times the two-pass distributed prefix sum, checks the
  * global invariants (min start = 0, max(start+tokens) = Σtokens, row
  * count preserved), and — the exactness proof — recomputes with P=1
  * (single range partition ⇒ trivially-correct serial scan) and
  * anti-joins the two offset sets: 0 mismatching rows means the
  * distributed offsets ARE the serial offsets at N.
  *
  * `decontam N B` — Decontaminate.flagContaminated over N synthetic
  * ~40-word documents against a B-document benchmark set: times the
  * broadcast-gram flagging at corpus scale and prints the contaminated
  * count (deterministic for fixed seeds).
  *
  * run: sbt "runMain graft.tools_dev.PipeScale pack 20000000"
  *      sbt "runMain graft.tools_dev.PipeScale decontam 2000000 500"
  */
object PipeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some("pack")     => pack(spark, args(1).toLong)
      case Some("decontam") => decontam(spark, args(1).toLong, args(2).toInt)
      case _ => sys.error("usage: PipeScale pack N | decontam N B")
    }
    spark.stop()
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pipescale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def pack(spark: SparkSession, n: Long): Unit = {
    println(s"[pipescale] pack n=$n")
    // deterministic token counts in [50, 250)
    val base = spark.range(n).toDF("doc_id")
      .withColumn("n_tokens", col("doc_id") * 2654435761L % 200L + 50L)
    val dist = timed(s"packOffsets P=256, n=$n") {
      val r = graft.ops.SequencePack
        .packOffsets(base, "doc_id", "n_tokens", 2048L, 256)
      r.cache().count()
      r
    }
    val inv = dist.agg(
      count(lit(1)).as("rows"),
      min(col("start_token")).as("minStart"),
      max(col("start_token") + col("n_tokens")).as("maxEnd"),
      sum(col("n_tokens")).as("total")).collect()(0)
    println(s"[pipescale] invariants: rows=${inv.getLong(0)} " +
      s"minStart=${inv.getLong(1)} maxEnd=${inv.getLong(2)} total=${inv.getLong(3)}")
    require(inv.getLong(0) == n && inv.getLong(1) == 0L &&
      inv.getLong(2) == inv.getLong(3), "global coverage invariants broken")
    // exactness vs the serial scan: P=1 is one range partition — the
    // prefix sum degenerates to a single in-order pass
    val serial = timed(s"packOffsets P=1 (serial oracle), n=$n") {
      val r = graft.ops.SequencePack
        .packOffsets(base, "doc_id", "n_tokens", 2048L, 1)
      r.cache().count()
      r
    }
    val mismatches = timed("offset equality join") {
      dist.alias("a").join(serial.alias("b"), Seq("doc_id"))
        .filter(col("a.start_token") =!= col("b.start_token"))
        .count()
    }
    println(s"[pipescale] mismatching offsets vs serial: $mismatches")
    require(mismatches == 0L, "distributed offsets differ from serial scan")
    val spans = dist.filter(col("spans_boundary")).count()
    println(s"[pipescale] spans_boundary docs: $spans (${100.0 * spans / n}%)")
  }

  def decontam(spark: SparkSession, n: Long, b: Int): Unit = {
    println(s"[pipescale] decontam n=$n bench=$b")
    // ~40-word documents from a 1000-word vocabulary; benchmark docs are
    // drawn from the same generator (ids n..n+b), so some 4-gram overlap
    // occurs naturally at matching PRNG states
    val gen = udf { (id: Long) =>
      val r = new scala.util.Random(id * 1099511628211L + 7)
      Array.fill(40)("w" + r.nextInt(1000)).mkString(" ")
    }
    val train = spark.range(n).toDF("doc_id")
      .withColumn("text", gen(col("doc_id")))
    val bench = spark.range(n, n + b).toDF("doc_id")
      .withColumn("text", gen(col("doc_id") % 4096L)) // replayed states ⇒ planted overlap
    val res = timed(s"flagContaminated n=$n b=$b") {
      val r = graft.ops.Decontaminate.flagContaminated(train, bench)
      r.cache().count()
      r
    }
    val hit = res.filter(col("contaminated")).count()
    println(s"[pipescale] contaminated: $hit of $n")
    require(hit > 0, "planted overlap not detected")
    val plan = res.queryExecution.executedPlan.toString
    require(plan.contains("BroadcastHashJoin"), "bench grams not broadcast")
    println("[pipescale] plan: broadcast confirmed")
  }
}
