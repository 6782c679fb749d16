package graft

import org.apache.spark.sql.functions._

/** Pins the py4j facade ([[PyFacade]]) from the JVM side, so the
  * Python module's entry points are CI-guarded even when the pyspark
  * smoke/tutorial scripts aren't run: each method must delegate to the
  * real operator (checked against a direct call) and keep the
  * py4j-trivial signature shape `python/graft.py` relies on.
  */
class PyFacadeSpec extends SparkSpec {

  private def vecs(n: Int, d: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(r.nextFloat()))
  }

  test("flatSearch/trainIvf/assign/ivfSearch delegate to the real operators") {
    import spark.implicits._
    val base = vecs(200, 8, 5L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val q = base.filter(col("id") < 4).select(col("id").as("qid"), col("vec"))
    val got = PyFacade.flatSearch(base, q, 5, "l2").collect()
    val want = graft.search.FlatSearch.knn(base, q, 5).collect()
    assert(got.toSeq == want.toSeq)
    val model = PyFacade.trainIvf(base, 8, "l2", 42L)
    assert(model.nlist == 8)
    val assigned = PyFacade.assign(base, model)
    assert(assigned.columns.toSeq.contains("list_no"))
    // full probe ≡ exact (the 2-IVFFlat tutorial's own assertion)
    val ivfAll = PyFacade.ivfSearch(assigned, model, q, 5, 8)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val exact = want.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll == exact, "nprobe=nlist must equal brute force")
  }

  test("trainPq/encodePq/ivfpqSearch run the compressed path end-to-end") {
    import spark.implicits._
    val base = vecs(300, 8, 7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val q = base.filter(col("id") < 3).select(col("id").as("qid"), col("vec"))
    val model = PyFacade.trainIvf(base, 4, "l2", 42L)
    val assigned = PyFacade.assign(base, model)
    val pq = PyFacade.trainPq(assigned, model, m = 4, nbits = 6, seed = 42L)
    val encoded = PyFacade.encodePq(assigned, model, pq)
    val res = PyFacade.ivfpqSearch(encoded, model, pq, q, 4, 4).collect()
    assert(res.length == 12, s"3 queries × k=4, got ${res.length}")
    // ADC self-distance ranks the query vector into the top-2
    val self = res.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.forall(_.getInt(3) <= 2),
      s"self-NN should rank in PQ top-2: ${self.mkString(",")}")
  }

  test("trainProfile + boundedSearch return [results, stats] with the bound shape") {
    import spark.implicits._
    val base = vecs(400, 8, 11L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val model = PyFacade.trainIvf(base, 8, "l2", 42L)
    val assigned = PyFacade.assign(base, model)
    val trainQ = base.filter(col("id") >= 300)
      .select(col("id").as("qid"), col("vec"))
    val traces = PyFacade.trainProfile(assigned, model, trainQ,
      maxTopk = 5, bs = 25)
    assert(traces.nonEmpty)
    val evalQ = base.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec"))
    val pair = PyFacade.boundedSearch(assigned, model, traces, evalQ,
      k = 5, requiredRecall = 0.9f, multiplier = 4.0f, stdM = 1.0f)
    assert(pair.length == 2)
    val results = pair(0); val stats = pair(1)
    assert(results.columns.toSeq == Seq("qid", "id", "dist", "rank"))
    assert(stats.columns.contains("nprobeUsed"))
    assert(stats.count() == 8, "one stats row per query")
    // recall vs exact must meet the requested bound on this fixture
    val exact = graft.search.FlatSearch.knn(base, evalQ, 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val got = results.select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"bounded recall $recall < 0.9")
  }
}
