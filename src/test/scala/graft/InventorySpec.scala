package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Guards the driver contract itself (round-7 postmortem): a testdata
  * regeneration flipped `events.ts` from ns-int64 to µs-timestamp and
  * silently dropped 7 driver rows — every query must ANALYZE against the
  * live fixtures, the inventory must stay at 77 rows, and the events
  * reader must accept both timestamp encodings the generator has used.
  */
class InventorySpec extends SparkSpec {

  test("driver inventory holds 77 queries, each with an oracle") {
    val q = SparkEntry.queries
    assert(q.size == 77, s"expected 77 driver rows, got ${q.size}")
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
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("events reader normalizes both generator timestamp encodings") {
    val real = sf("sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("evfix").toString
    // Reconstruct the pre-r7 shape: ts as int64 nanoseconds (what a
    // parquet timestamp[ns] column resolves to under nanosAsLong).
    Relational.events(spark, real)
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val legacy = Relational.events(spark, tmp)
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
}
