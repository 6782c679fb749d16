package graft

import org.apache.spark.sql.functions._
import graft.index.{IVFDedup, IVFIndex, IndexFactory}
import graft.search.{FlatSearch, IVFSearch}

/** IndexIVFFlatDedup (`Auncel/IndexIVFFlat.cpp:233-410`,
  * `tests/test_index_composite.py:345-395`): add-time dedup of
  * identical vectors, search-time duplicate expansion, rep promotion
  * on delete. */
class IVFDedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted duplicates: every 5th vector gets a twin at
  // id+10000, and vector 0 additionally gets a second copy at 20000
  // (a triple — exercises multi-instance expansion)
  lazy val base = clusteredVecs(2000, 16, nClusters = 12, seed = 51)
  lazy val dupRows: Seq[(Long, Array[Float])] =
    base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq ++
      base.zipWithIndex.collect { case (v, i) if i % 5 == 0 =>
        (i + 10000L, v) } :+ (20000L, base(0))
  lazy val dupDF = dupRows.toDF("id", "vec").cache()
  lazy val model = IVFDedup.train(dupDF, nlist = 8, seed = 42L)
  lazy val index = {
    val idx = IVFDedup.build(dupDF, model)
    IVFDedup.DedupIndex(idx.unique.cache(), idx.instances.cache())
  }
  lazy val qDF = vecDF(randVecs(10, 16, seed = 52), "qid")

  test("build collapses duplicates to min-id reps; nothing is lost") {
    assert(index.unique.count() == 2000) // one row per distinct vector
    assert(index.countTotal() == dupRows.length)
    // every rep is the smallest id among its instances
    val bad = index.instances.filter(col("dup_id") < col("rep_id")).count()
    assert(bad == 0)
    // the triple: rep 0 carries instances 10000 and 20000
    val inst0 = index.instances.filter(col("rep_id") === 0)
      .select(col("dup_id")).as[Long].collect().sorted
    assert(inst0.sameElements(Array(10000L, 20000L)))
  }

  test("full-probe dedup search equals flat search over the duplicated corpus") {
    val got = IVFDedup.search(index, model, qDF, k = 10, nprobe = model.nlist)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val want = FlatSearch.knn(dupDF, qDF, k = 10)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
  }

  test("probed dedup search equals plain IVF search over the duplicated corpus") {
    val assignedDup = IVFIndex.assign(dupDF, model).cache()
    for (np <- Seq(2, 4)) {
      val got = IVFDedup.search(index, model, qDF, k = 10, nprobe = np)
        .select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val want = IVFSearch.search(assignedDup, model, qDF, k = 10, nprobe = np)
        .select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.sameElements(want), s"nprobe=$np")
    }
  }

  test("duplicate ids surface in results at the same distance") {
    // query exactly vector 0: ids 0, 10000, 20000 must all appear with
    // identical distance, id-ascending
    val q = Seq((0L, base(0))).toDF("qid", "vec")
    val r = IVFDedup.search(index, model, q, k = 5, nprobe = model.nlist)
      .orderBy(col("rank"))
      .select(col("id"), col("dist")).as[(Long, Double)].collect()
    assert(r(0)._1 == 0L && r(1)._1 == 10000L && r(2)._1 == 20000L)
    assert(r(0)._2 == r(1)._2 && r(1)._2 == r(2)._2)
  }

  test("removeIds: dup removal, rep promotion, and full-group removal") {
    // remove a plain duplicate (10000 — instance of rep 0): map shrinks
    val afterDup = IVFDedup.removeIds(index, Seq(10000L).toDF("id"))
    assert(afterDup.unique.count() == 2000)
    assert(afterDup.instances.count() == index.instances.count() - 1)

    // remove rep 0: 10000 promotes (min surviving instance)
    val afterRep = IVFDedup.removeIds(index, Seq(0L).toDF("id"))
    assert(afterRep.unique.filter(col("id") === 0L).count() == 0)
    assert(afterRep.unique.filter(col("id") === 10000L).count() == 1)
    val remapped = afterRep.instances.filter(col("rep_id") === 10000L)
      .select(col("dup_id")).as[Long].collect()
    assert(remapped.sameElements(Array(20000L)))

    // remove every instance of vector 5's group (5 and 10005): row drops
    val afterAll = IVFDedup.removeIds(index, Seq(5L, 10005L).toDF("id"))
    assert(afterAll.unique.count() == 1999)

    // search after rep removal ≡ flat over the corpus minus the id
    val got = IVFDedup.search(afterRep, model, qDF, k = 10, nprobe = model.nlist)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val want = FlatSearch.knn(dupDF.filter(col("id") =!= 0L), qDF, k = 10)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
  }

  test("write/read round-trip searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    IVFDedup.write(index, dir)
    val re = IVFDedup.read(spark, dir)
    val got = IVFDedup.search(re, model, qDF, k = 10, nprobe = model.nlist)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val want = IVFDedup.search(index, model, qDF, k = 10, nprobe = model.nlist)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
  }

  test("index_factory IVF8,FlatDedup builds a dedup index; bare FlatDedup rejected") {
    val idx = IndexFactory.build("IVF8,FlatDedup", dupDF)
    assert(idx.spec.dedup && idx.instances.nonEmpty)
    assert(idx.data.count() == 2000)
    val got = idx.search(qDF, k = 10, nprobe = 8)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val want = FlatSearch.knn(dupDF, qDF, k = 10)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
    intercept[IllegalArgumentException](IndexFactory.parse("FlatDedup"))
    // the reference rejects dedup over any non-Flat storage
    // ("Dedup supported only for IVFFlat", AutoTune.cpp:831); a later
    // encoding token must not silently win while dedup stays set
    intercept[IllegalArgumentException](IndexFactory.parse("IVF8,FlatDedup,PQ4"))
    intercept[IllegalArgumentException](IndexFactory.parse("IVF8,FlatDedup,SQ8"))
  }

  test("dedup equality is bit-exact: +0.0 and -0.0 stay separate (memcmp parity)") {
    // IndexIVFFlat.cpp:295-305 compares raw codes with memcmp, so a
    // vector differing only in zero sign is NOT a duplicate there; a
    // plain groupBy(vec) would merge them (Spark normalizes -0.0)
    val v = Array.fill(16)(1.0f); v(3) = 0.0f
    val vNeg = v.clone(); vNeg(3) = -0.0f
    val filler = randVecs(20, 16, seed = 53).zipWithIndex
      .map { case (x, i) => (100L + i, x) }
    val rows = Seq((0L, v), (1L, vNeg), (2L, v)) ++ filler
    val df = rows.toDF("id", "vec")
    val m = IVFDedup.train(df, nlist = 2, seed = 7L)
    val idx = IVFDedup.build(df, m)
    assert(idx.unique.count() == rows.length - 1,
      "-0.0 variant must keep its own row; only the exact twin collapses")
    val inst = idx.instances.select(col("rep_id"), col("dup_id"))
      .as[(Long, Long)].collect()
    assert(inst.sameElements(Array((0L, 2L))))
  }
}
