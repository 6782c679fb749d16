package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Guards the driver contract itself (round-7 postmortem): a testdata
  * regeneration flipped `events.ts` from ns-int64 to µs-timestamp and
  * silently dropped 7 driver rows — every query must ANALYZE against the
  * live fixtures, the inventory must hold exactly the row count the
  * test below asserts, and the events reader must accept both
  * timestamp encodings the generator has used.
  */
class InventorySpec extends SparkSpec {

  test("driver inventory holds 88 queries, each with an oracle") {
    val q = SparkEntry.queries
    assert(q.size == 88, s"expected 88 driver rows, got ${q.size}")
    val oracles = SparkEntry.oracleSqlFor(sf("sf0.001"))
    val missing = q.keySet -- oracles.keySet
    assert(missing.isEmpty, s"queries without oracle: ${missing.toList.sorted.mkString(",")}")
    val orphans = oracles.keySet -- q.keySet
    assert(orphans.isEmpty, s"oracles without query: ${orphans.toList.sorted.mkString(",")}")
  }

  test("every inventory query analyzes against the current sf0.001 fixtures") {
    // Resolution (not execution) is enough to catch fixture/schema drift
    // loudly, per named query, before the driver's Verify run. Queries
    // whose construction does real work (index builds, s03's streaming
    // run) are exercised by construction itself.
    val dir = sf("sf0.001")
    val failures = SparkEntry.queries.toList.sortBy(_._1).flatMap { case (name, f) =>
      try {
        f(spark, dir).queryExecution.analyzed
        None
      } catch {
        // NonFatal only: an OOM/linkage error must crash the suite, not
        // be reported as one query's analysis failure
        case scala.util.control.NonFatal(e) =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("events reader normalizes both generator timestamp encodings") {
    val real = sf("sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("evfix").toString
    // The ns reconstruction below round-trips through cast(timestamp),
    // which interprets NTZ wall-clock in the session timezone — only
    // faithful to genuine ns-since-epoch data because the session is
    // pinned UTC. Make that coupling explicit.
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "events-reader fixture reconstruction requires a UTC session")
    // Reconstruct the pre-r7 shape: ts as int64 nanoseconds (what a
    // parquet timestamp[ns] column resolves to under nanosAsLong).
    Relational.events(spark, real)
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val legacy = Relational.events(spark, tmp)
    // the legacy-ns branch runs on an isolated newSession — the
    // CALLER's conf must come through a legacy-fixture read unchanged
    // (pre-r10 the reader left nanosAsLong=true set on the shared
    // session as a load-bearing side effect)
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false",
      "legacy-fixture read mutated the caller session's nanosAsLong conf")
    val current = Relational.events(spark, real)
    assert(legacy.schema("ts").dataType == current.schema("ts").dataType)
    assert(legacy.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // identical rows through the reader...
    assert(legacy.exceptAll(current).isEmpty && current.exceptAll(legacy).isEmpty)
    // ...and through a batch and a window query
    val q08a = Relational.q08EventsHourly(spark, tmp).collect()
    val q08b = Relational.q08EventsHourly(spark, real).collect()
    assert(q08a.nonEmpty && q08a.sameElements(q08b))
    val s01a = Relational.s01StreamWindows(spark, tmp).collect()
    val s01b = Relational.s01StreamWindows(spark, real).collect()
    assert(s01a.nonEmpty && s01a.sameElements(s01b))
  }

  test("ns→µs conversion matches DuckDB's cast: truncation toward zero, pre-epoch included") {
    // Pinned from a direct DuckDB measurement (parquet timestamp[ns] →
    // CAST(... AS TIMESTAMP) → epoch_us), 2026-08-13: DuckDB TRUNCATES
    // toward zero, it does not floor — −1500 ns → −1 µs (floor: −2),
    // −999 → 0, −2001 → −2 (floor: −3). `ts div 1000` must keep exactly
    // these semantics or pre-epoch oracle parity silently breaks.
    val pinned = Seq(-1500L -> -1L, 1500L -> 1L, -999L -> 0L,
      -2001L -> -2L, 0L -> 0L)
    val tmp = java.nio.file.Files.createTempDirectory("evns").toString
    import spark.implicits._
    // a plain int64 `ts` column resolves to LongType — same resolved
    // shape as timestamp[ns] under nanosAsLong, so it drives the same
    // reader branch without needing a ns-writing parquet encoder
    pinned.map(_._1).toDF("ts").write.mode("overwrite")
      .parquet(s"$tmp/events.parquet")
    val got = Relational.events(spark, tmp)
      .select(col("ts")).collect()
      .map(_.getAs[java.time.LocalDateTime](0))
      .map(ldt => ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L)
      .sorted
    assert(got.toSeq == pinned.map(_._2).sorted,
      s"ns→µs drifted from DuckDB truncation semantics: got ${got.toList}")
  }

  test("events reader never mutates the caller's nanosAsLong conf (µs path)") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val real = sf("sf0.001")
    val before = spark.conf.getOption(key)
    try {
      // note: getOption returns the conf's DEFAULT ("false") when unset,
      // so the observable contract is the effective value, not unset-ness
      spark.conf.unset(key)
      Relational.events(spark, real).collect()
      assert(spark.conf.get(key) == "false",
        "default-off conf must read back off after a µs-fixture read")
      spark.conf.set(key, "false")
      Relational.events(spark, real).collect()
      assert(spark.conf.get(key) == "false",
        "explicit caller setting must survive a µs-fixture read")
      // the legacy-ns branch keeps the conf set on its own isolated
      // newSession instead of the caller's (see Relational.events
      // scaladoc); the caller-side assertion for THAT branch lives in
      // the "normalizes both generator timestamp encodings" test
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
