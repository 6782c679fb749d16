package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the query inventory on
  * SPARK_GRAFT_SF_DIR at local[N] and prints ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}.
  *
  * Four passes. The first (untimed, reported as "build_sec") runs every
  * query once: it trains and persists the model artifacts — k-means
  * centroids, error-profile traces, HNSW adjacency, PQ codebooks,
  * MinHash signature tables — and warms JVM/codegen/parquet-footer
  * caches. The next three are timed sweeps; each query reports its
  * MEDIAN across the three, so what's measured is steady-state query
  * cost and a single noisy host interval can't become the official
  * number. This matches the reference's methodology of
  * building the index once and timing search only
  * (`Auncel/eval/bound.cpp:265-268` reloads the prebuilt index + profile
  * before the timed phase; the build is never billed to queries).
  *
  * Each query is materialized with collect() (results are small by
  * construction) so column pruning can't hide work the way count()
  * would.
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

    val inventory = SparkEntry.queries.toSeq.sortBy(_._1)

    // pass 1 — build: train/persist model artifacts, warm caches
    val b0 = System.nanoTime()
    inventory.foreach { case (name, fn) =>
      try { fn(spark, sfDir).collect() }
      catch { case e: Throwable =>
        System.err.println(s"[bench-build] $name failed: ${e.getMessage}")
      }
    }
    val buildSec = (System.nanoTime() - b0) / 1e9

    // passes 2-4 — timed: steady-state query cost, median of 3 sweeps.
    // A single timed measurement let one noisy host interval become the
    // round's official number (r4: t02 read 4.32 s against a 0.62 s rerun);
    // the per-query median across three full sweeps kills that class.
    // A pass that THROWS is excluded from the median — a fast failure
    // must not masquerade as a fast steady-state time; a query with no
    // successful pass reports -1 and lands in "failed".
    val timedPasses = 3
    val samples = Array.fill(timedPasses) {
      inventory.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).collect(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }.toMap
    }
    val results = inventory.map { case (name, _) =>
      val xs = samples.flatMap(_(name)).sorted
      name -> (if (xs.isEmpty) -1.0 else xs(xs.length / 2))
    }
    println(renderLine(results, buildSec, sfDir))
    // second line AFTER the main one: the 10 worst rows, so the
    // harvester's 2000-char tail capture keeps per-query evidence for
    // exactly the rows a reviewer asks about (a01–a03's times fell off
    // the r9 tail). Ratios vs the per-query pins when BASELINE.md is
    // readable, absolute medians otherwise.
    val pins =
      try parsePins(java.nio.file.Files.readString(java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md"))))
      catch { case scala.util.control.NonFatal(_) => Map.empty[String, Double] }
    println(renderWorstLine(results, pins))
    // third line: every row's ratio (or median sec) keyed by SHORT
    // name. The full `queries` map above runs ~2.3k chars with long
    // names and the capture keeps ~2k, so rows a01–mm01 were invisible
    // in BENCH_r11; short keys fit the whole inventory in under 1k chars.
    println(renderAllRowsLine(results, pins))
    // fourth line, LAST: every row's ABSOLUTE median seconds, short
    // keys. r13's harvest cut the head-of-line `queries` map mid-row,
    // so the artifact had complete ratios but incomplete absolute
    // times; with seconds emitted last, the ~4 KB tail capture holds
    // the ratio line AND the seconds line — fully self-contained.
    println(renderSecondsLine(results))
    spark.stop()
  }

  /** Per-query pins from BASELINE.md's "Per-query reference" block:
    * short-name float pairs like `a01 0.80,` / `s03 1.7`. Parsing is
    * ANCHORED to that header — prose added above it can't shadow a
    * pin — and within the block first occurrence wins. */
  private[graft] def parsePins(text: String): Map[String, Double] = {
    // line-START header match: a prose mention of the phrase mid-line
    // ("see the Per-query reference table below; q01 9.99 was …") must
    // not become the anchor, or it would re-introduce the shadowing
    // this anchor exists to prevent. Leading '#'/whitespace is allowed
    // (a markdown-heading reformat must keep anchoring, not silently
    // fall back to a whole-document scan) and the " (" tail is required
    // (a prose line that merely BEGINS with the phrase must not anchor).
    val anchored = """(?m)^[#\s]*Per-query reference \(""".r
      .findFirstMatchIn(text) match {
      case None    => text // no header: fall back to whole-document scan
      case Some(m) => text.substring(m.start)
    }
    val re = """\b(mm\d{2}|[adqstv]\d{2}) (\d+(?:\.\d+)?)""".r
    re.findAllMatchIn(anchored).foldLeft(Map.empty[String, Double]) { (m, x) =>
      if (m.contains(x.group(1))) m else m + (x.group(1) -> x.group(2).toDouble)
    }
  }

  /** One compact JSON line with the 10 worst rows — by measured/pin
    * ratio when pins are available ("basis":"ratio_vs_pin"), by median
    * seconds otherwise ("basis":"sec"). Failed rows (−1) always lead. */
  private[graft] def renderWorstLine(
      results: Seq[(String, Double)], pins: Map[String, Double]): String = {
    def pinOf(name: String): Option[Double] =
      pins.get(name.takeWhile(_ != '_')).filter(_ > 0)
    val usable = results.filter(_._2 >= 0)
    val (basis, scored) =
      if (usable.nonEmpty && usable.forall(r => pinOf(r._1).isDefined))
        ("ratio_vs_pin",
          usable.map { case (n, v) => (n, v / pinOf(n).get) })
      else ("sec", usable)
    val worst = results.filter(_._2 < 0).map(_._1 -> -1.0) ++
      scored.sortBy(-_._2)
    val rows = worst.take(10)
      .map { case (n, v) => "\"" + n + f"\":$v%.3f" }.mkString("{", ",", "}")
    s"""{"worst":$rows,"basis":"$basis"}"""
  }

  /** One compact JSON line with EVERY row, keyed by short name (the
    * prefix before the first '_'), so the harvester's ~2k-char tail
    * capture holds the complete per-query picture — ratio vs pin when
    * every pin resolves ("basis":"ratio_vs_pin"), median seconds
    * otherwise. Failed rows report -1 under either basis. */
  private[graft] def renderAllRowsLine(
      results: Seq[(String, Double)], pins: Map[String, Double]): String = {
    def short(name: String): String = name.takeWhile(_ != '_')
    def pinOf(name: String): Option[Double] =
      pins.get(short(name)).filter(_ > 0)
    // two result names sharing a short prefix would emit duplicate JSON
    // keys (later silently shadows earlier in most parsers) and "n"
    // would overcount the visible rows — fall back to full names then
    val shorts = results.map(r => short(r._1))
    val key: String => String =
      if (shorts.distinct.size == shorts.size) short else identity
    val usable = results.filter(_._2 >= 0)
    val basis =
      if (usable.nonEmpty && usable.forall(r => pinOf(r._1).isDefined))
        "ratio_vs_pin"
      else "sec"
    val rows = results.map { case (n, v) =>
      val x =
        if (v < 0) -1.0
        else if (basis == "ratio_vs_pin") v / pinOf(n).get
        else v
      "\"" + key(n) + f"\":$x%.3f"
    }.mkString("{", ",", "}")
    s"""{"rows":$rows,"basis":"$basis","n":${results.size}}"""
  }

  /** One compact JSON line with EVERY row's absolute median seconds,
    * short-keyed like [[renderAllRowsLine]] (same duplicate-prefix
    * fallback to full names). Failed rows report -1. Emitted LAST so
    * the harvester's tail capture always holds complete absolute
    * times next to the complete ratio line. */
  private[graft] def renderSecondsLine(results: Seq[(String, Double)]): String = {
    def short(name: String): String = name.takeWhile(_ != '_')
    val shorts = results.map(r => short(r._1))
    val key: String => String =
      if (shorts.distinct.size == shorts.size) short else identity
    val rows = results.map { case (n, v) =>
      "\"" + key(n) + f"\":${if (v < 0) -1.0 else v}%.3f"
    }.mkString("{", ",", "}")
    s"""{"secs":$rows,"n":${results.size}}"""
  }

  /** Renders the one-line JSON artifact. The verdict fields (`value`,
    * `valid`, `failed`) lead the line for human readers but ALSO repeat
    * in a compact trailer (`total2`/`valid2`/`failed2`) after the large
    * `queries` map, because the round harvester keeps only the last
    * 2000 characters of stdout — BENCH_r08 lost its head to that
    * truncation and the official artifact could not prove the gate
    * passed. With the trailer, any tail capture ≥ ~120 chars contains
    * the verdict regardless of inventory size. BenchLineSpec pins this. */
  private[graft] def renderLine(
      results: Seq[(String, Double)], buildSec: Double, sfDir: String): String = {
    val failed = results.collect { case (name, v) if v < 0 => name }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // a run with ANY failed query must not report a (smaller) total that
    // reads as a speedup to a consumer comparing value alone: the total
    // goes to -1 and valid:false, per-query medians stay inspectable
    val okTotal = results.map(_._2).filter(_ >= 0).sum
    val total = if (failed.isEmpty) okTotal else -1.0
    val valid = failed.isEmpty
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","valid":$valid,"queries":$qs,"sf":"$sfDir","failed":$failedJson,"build_sec":$buildSec%.3f,"failed2":$failedJson,"total2":$total%.3f,"valid2":$valid}"""
  }
}
