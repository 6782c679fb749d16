package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed on the join key
  * join WITHOUT a shuffle — the big-fact-join strategy at 100 TB when
  * both tables are written once and joined many times. */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the join key runs without a shuffle exchange") {
    import spark.implicits._
    // warehouse.dir is static; the default (./spark-warehouse, gitignored)
    // is fine for the managed test tables
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      val lineitem = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must not shuffle: no Exchange below the SortMergeJoin
      val joinSection = plan.split("\n").dropWhile(!_.contains("SortMergeJoin"))
        .takeWhile(l => !l.contains("HashAggregate") || l.contains("SortMergeJoin"))
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!joinSection.exists(_.contains("Exchange")),
        s"shuffle under the bucketed join:\n${joinSection.mkString("\n")}")

      // and the result matches the unbucketed join
      val want = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().sortBy(_._1)
      val got = joined.as[(String, Long)].collect().sortBy(_._1)
      assert(got.sameElements(want))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
