package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A hot grouping key
  * that would pin one reducer is spread across `salts` sub-keys; phase
  * one aggregates (key, salt) partials in parallel, phase two merges
  * the (tiny) partials per key. Correct for any commutative monoid —
  * count and sum provided; AQE's skew-join handling covers the join
  * side, this covers aggregation.
  */
object Skew {

  /** count(*) per key, salt-spread. Bit-identical to the direct
    * groupBy count (integer addition is associative). */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n"))

  /** Exact decimal sum per key, salt-spread (decimal addition is
    * associative — same bits as the direct aggregation). */
  def saltedSumDecimal(df: DataFrame, key: Column, value: Column,
                       salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value.cast("decimal(18,2)")).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).cast("double").as("total"))
}
