package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Kernels, VectorFunctions}
import graft.index.BinaryHash

/** Embedding-cosine near-duplicate detection, two regimes:
  *
  *  - [[exactPairs]]: all-pairs cosine ≥ threshold — O(N²), fine for
  *    small collections or as the verification oracle;
  *  - [[lshPairs]]: the 100 TB path — random-hyperplane signatures,
  *    banded equi-join for candidates (near-identical vectors agree on
  *    most sign bits → share a band), exact cosine only on candidates.
  *    Cost: O(N·bands) + O(candidates), never O(N²).
  */
object EmbeddingDedup {

  def exactPairs(df: DataFrame, threshold: Double): DataFrame = {
    val a = df.select(col("id").as("a"), col("vec").as("va"))
    val b = df.select(col("id").as("b"), col("vec").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** @param nBands bands over the 63-bit signature; a candidate pair
    *               must agree exactly on ≥1 band (15 bits for 4 bands).
    *               More bands → higher recall at lower thresholds. */
  def lshPairs(df: DataFrame, model: BinaryHash.LSHModel, threshold: Double,
               nBands: Int = 7): DataFrame = {
    val spark = df.sparkSession
    val sigs = BinaryHash.encode(df, model).select(col("id"), col("vec"), col("sig"))
    val width = 63 / nBands
    val mask = (1L << width) - 1
    val bands = (0 until nBands).map { b =>
      sigs.select(col("id"), col("vec"), lit(b).as("band"),
        shiftright(col("sig"), b * width).bitwiseAND(mask).as("key"))
    }.reduce(_ unionByName _)
    val x = bands.select(col("band"), col("key"), col("id").as("a"), col("vec").as("va"))
    val y = bands.select(col("band"), col("key"), col("id").as("b"), col("vec").as("vb"))
    val bth = threshold
    val cosU = udf { (p: Seq[Float], q: Seq[Float]) =>
      Kernels.cosine(p.toArray, q.toArray)
    }
    x.join(y, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("va"), col("vb")).distinct()
      .withColumn("cos", cosU(col("va"), col("vb")))
      .filter(col("cos") >= bth)
      .select(col("a"), col("b"), col("cos"))
  }
}
