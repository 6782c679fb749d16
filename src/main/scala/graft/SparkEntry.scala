package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Documents, Relational, Vector}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in graft.queries.*; each entry has a DuckDB
  * oracle in [[oracleSql]] unless the operator is inherently
  * non-SQL-expressible (ANN with trained partitions, adaptive bounded
  * search), which get rows-only checks plus recall assertions in the
  * ScalaTest suites.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Vector.queries ++ Documents.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The dir-parametrized form points
    * side-table oracles (a01/a02/v06/v17/v18/v19) at the tables the
    * queries persisted for that same dataset dir; the no-arg form keeps
    * the driver contract, deriving its dir from the same env var the
    * driver passes to Bench (so it can never silently diverge from the
    * verified scale factor). Verify itself uses oracleSqlFor(sfDir). */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

  def oracleSqlFor(sfDir: String): Map[String, String] =
    Relational.oracles ++ Vector.oracles(sfDir) ++ Documents.oracles
}
