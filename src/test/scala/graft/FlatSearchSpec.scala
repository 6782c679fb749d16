package graft

import org.apache.spark.sql.functions._
import graft.search.FlatSearch

class FlatSearchSpec extends SparkSpec {

  test("knn matches brute-force oracle exactly (L2 and IP)") {
    import spark.implicits._
    val base = randVecs(2000, 24, seed = 1)
    val qs = randVecs(20, 24, seed = 2)
    val baseDF = vecDF(base).repartition(7) // odd partitioning on purpose
    val qDF = vecDF(qs, "qid")
    for (metric <- Seq("l2", "ip")) {
      val got = FlatSearch.knn(baseDF, qDF, k = 15, metric)
        .select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._4, r._3))).toMap
      qs.zipWithIndex.foreach { case (q, qi) =>
        val want = bruteForce(base, q, 15, metric)
        assert(got(qi.toLong).sameElements(want), s"metric=$metric qid=$qi")
      }
    }
  }

  test("range search returns exactly the in-radius set") {
    import spark.implicits._
    val base = randVecs(500, 16, seed = 4)
    val qs = randVecs(5, 16, seed = 5)
    val r = 1.8
    val got = FlatSearch.range(vecDF(base), vecDF(qs, "qid"), r)
      .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    val want = (for {
      (q, qi) <- qs.zipWithIndex
      (v, i) <- base.zipWithIndex
      if graft.functions.Kernels.l2Sqr(q, v) < r
    } yield (qi.toLong, i.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("knnSubset only returns ids from the subset") {
    import spark.implicits._
    val base = randVecs(300, 8, seed = 6)
    val ids = spark.range(0, 300, 3).toDF("id") // every 3rd id
    val got = FlatSearch.knnSubset(vecDF(base), vecDF(randVecs(3, 8, seed = 7), "qid"),
      k = 10, ids)
    assert(got.count() == 30)
    assert(got.filter(col("id") % 3 =!= 0).count() == 0)
  }
}
