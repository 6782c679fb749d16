package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O14 — per-workload calibration hyperparameters
  * (`Auncel/hyperparameter.txt:1-12`, loaded by `setparam`
  * `IVF_pro.cpp:240-256`): the probe-count multiplier and σ-margin
  * multiplier that turn the profile's prediction into a guarantee.
  */
object Calibration {

  final case class Entry(figureId: Int, multiplier: Float, stdM: Float)

  /** The reference's committed constants, one row per experiment figure. */
  val reference: Seq[Entry] = Seq(
    Entry(1, 9.3f, 1.0f), Entry(2, 6.9f, 1.0f), Entry(3, 2.7f, 12.0f),
    Entry(4, 11.0f, 8.0f), Entry(5, 6.7f, 1.0f), Entry(6, 7.9f, 6.0f),
    Entry(7, 10.2f, 6.0f), Entry(8, 26.5f, 1.0f), Entry(9, 10.0f, 0.2f),
    Entry(10, 4.2f, 1.0f), Entry(11, 4.5f, 1.0f), Entry(12, 15.0f, 1.0f))

  def forFigure(id: Int): Entry =
    reference.find(_.figureId == id)
      .getOrElse(throw new NoSuchElementException(s"no calibration row $id"))

  def toDF(spark: SparkSession, entries: Seq[Entry] = reference): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }

  def save(spark: SparkSession, path: String,
           entries: Seq[Entry] = reference): Unit =
    toDF(spark, entries).coalesce(1).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): Seq[Entry] = {
    import spark.implicits._
    spark.read.parquet(path).as[Entry].collect().sortBy(_.figureId).toSeq
  }
}
