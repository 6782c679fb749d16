package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-mixing operators for training-data
  * pipelines.
  *
  * A 100 TB pre-training corpus is never consumed whole: each source is
  * sampled to a target mixing weight, and the result must be exactly
  * reproducible — re-running the pipeline (or re-running one failed
  * partition) must select the SAME documents, which rules out RNG-based
  * `df.sample`. Everything here keys selection on pure integer
  * arithmetic over the stable document id (a Lehmer-style
  * multiplicative hash), so membership is a property of the row, not of
  * execution order, partitioning, or retry history — and the whole
  * operator is a map-side filter: zero shuffles at any corpus size, and
  * both engines of the verification harness (Spark and the DuckDB
  * oracle) can evaluate it bit-identically.
  */
object Sampling {

  /** 2^31 − 1, the Mersenne-prime modulus of the minimal standard
    * Lehmer generator — one multiply + two mods per row, exactly
    * representable in any engine's 64-bit integer arithmetic (ids up
    * to ~1.9e14 multiply without Long overflow; document ids are far
    * below that). */
  val HashMod = 2147483647L

  /** Deterministic bucket in [0, buckets) for a non-negative integer
    * id. Different `mult` values give independent bucketings (sampling
    * vs train/val split below use different multipliers so the val set
    * is not a suffix of the sample). */
  def hashBucket(id: Column, mult: Long, buckets: Int): Column =
    id * lit(mult) % lit(HashMod) % lit(buckets)

  /** Per-key weighted sampling ("dataset mixing"): keep each row with
    * probability ratesPermyriad(key)/10000 (defaultPermyriad for keys
    * not in the spec), selected by deterministic id hash. One map-side
    * filter — no shuffle, no RNG, stable under retries and
    * repartitioning. */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
                       ratesPermyriad: Map[String, Int],
                       defaultPermyriad: Int): DataFrame = {
    require(defaultPermyriad >= 0 && defaultPermyriad <= 10000 &&
      ratesPermyriad.values.forall(r => r >= 0 && r <= 10000),
      "rates are permyriad (0..10000)")
    // sorted fold → a deterministic when-chain regardless of map order
    val rate = ratesPermyriad.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermyriad)) { case (acc, (k, v)) =>
        when(col(keyCol) === lit(k), lit(v)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol), SampleMult, 10000) < rate)
  }

  /** Deterministic train/validation assignment: "train" for
    * trainPermyriad/10000 of ids, "val" for the rest. Uses a different
    * multiplier than [[stratifiedSample]] so the two bucketings are
    * independent. */
  def trainValSplit(id: Column, trainPermyriad: Int): Column =
    when(hashBucket(id, SplitMult, 10000) < lit(trainPermyriad),
      lit("train")).otherwise(lit("val"))

  /** Multiplier for sampling membership (minimal-standard 48271). */
  val SampleMult = 48271L

  /** Multiplier for the train/val bucketing (Lewis–Goodman–Miller
    * 16807) — independent of [[SampleMult]]. */
  val SplitMult = 16807L
}
