package graft

import org.apache.spark.sql.functions._
import graft.index.{BinaryHash, IndexFactory, IndexIO, HNSW}
import graft.quantize.{ProductQuantizer, ScalarQuantizer}
import graft.transforms._

/** Persistence round-trips (`Auncel/index_io.h:37-54` parity): every
  * trained model must save → load → search bit-identically, so a user
  * can reuse a trained index across sessions. */
class IndexIOSpec extends SparkSpec {

  lazy val base = clusteredVecs(600, 32, nClusters = 8, seed = 91)
  lazy val baseDF = vecDF(base).cache()
  lazy val qDF = vecDF(randVecs(6, 32, seed = 92), "qid")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_io_$name")
    d.toFile.deleteOnExit()
    s"$d/m"
  }

  test("PQ model round-trips bit-identically") {
    val pq = ProductQuantizer.train(baseDF, m = 8, nbits = 6)
    val path = tmp("pq")
    IndexIO.savePQ(pq, path, spark)
    val back = IndexIO.loadPQ(path, spark)
    assert(back.m == pq.m && back.nbits == pq.nbits)
    (0 until pq.m).foreach { s =>
      (0 until pq.ksub).foreach { c =>
        assert(back.codebooks(s)(c).sameElements(pq.codebooks(s)(c)))
      }
    }
    // encodings (and therefore ADC search) identical
    base.take(20).foreach(v => assert(back.encode(v).sameElements(pq.encode(v))))
  }

  test("SQ model round-trips bit-identically") {
    val sq = ScalarQuantizer.train(baseDF)
    val path = tmp("sq")
    IndexIO.saveSQ(sq, path, spark)
    val back = IndexIO.loadSQ(path, spark)
    assert(back.vmin.sameElements(sq.vmin) && back.vmax.sameElements(sq.vmax))
    base.take(20).foreach { v =>
      assert(back.decode(back.encode(v)).sameElements(sq.decode(sq.encode(v))))
    }
  }

  test("LSH model round-trips bit-identically") {
    val lsh = BinaryHash.train(d = 32, nbits = 63, seed = 5L)
    val path = tmp("lsh")
    IndexIO.saveLSH(lsh, path, spark)
    val back = IndexIO.loadLSH(path, spark)
    base.take(20).foreach(v => assert(back.signature(v) == lsh.signature(v)))
  }

  test("wide LSH model round-trips bit-identically") {
    val wide = graft.index.BinaryHash.trainWide(d = 32, nbits = 128, seed = 9L)
    val path = tmp("widelsh")
    IndexIO.saveWideLSH(wide, path, spark)
    val back = IndexIO.loadWideLSH(path, spark)
    assert(back.nbits == wide.nbits && back.nWords == wide.nWords)
    base.take(20).foreach(v =>
      assert(back.signature(v).sameElements(wide.signature(v))))
  }

  test("transform chain (linear + l2norm + center + remap) round-trips") {
    val chain = TransformChain(Seq(
      LinearTransform.randomRotation(32, seed = 3L),
      CenterTransform.fit(baseDF),
      L2NormTransform,
      RemapTransform(24)))
    val path = tmp("chain")
    IndexIO.saveChain(chain, path, spark)
    val back = IndexIO.loadChain(path, spark)
    base.take(20).foreach { v =>
      assert(back.applyVec(v).sameElements(chain.applyVec(v)))
    }
  }

  test("factory index build → save → load → search is bit-identical (IVF+PQ)") {
    import spark.implicits._
    val spec = "PCA16,IVF8,PQ8"
    val idx = IndexFactory.build(spec, baseDF)
    val path = tmp("gidx")
    IndexIO.saveIndex(idx, spec, path)
    val back = IndexIO.loadIndex(path, spark)
    val a = idx.search(qDF, k = 5, nprobe = 8)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    val b = back.search(qDF, k = 5, nprobe = 8)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    assert(a.sameElements(b))
  }

  test("factory HNSW index persists its graph and searches identically") {
    import spark.implicits._
    val spec = "HNSW16"
    val idx = IndexFactory.build(spec, baseDF)
    assert(idx.graph.isDefined)
    val path = tmp("hnsw")
    IndexIO.saveIndex(idx, spec, path)
    val back = IndexIO.loadIndex(path, spark)
    assert(back.graph.isDefined)
    val a = idx.search(qDF, k = 5)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    val b = back.search(qDF, k = 5)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    assert(a.sameElements(b))
  }

  test("standalone HNSW graph write → read → search is identical") {
    import spark.implicits._
    val g = HNSW.buildGraph(baseDF, nParts = 4)
    val path = tmp("graph")
    HNSW.writeGraph(g, path)
    val back = HNSW.readGraph(spark, path)
    val a = HNSW.searchGraph(g, qDF, k = 5, efSearch = 64)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    val b = HNSW.searchGraph(back, qDF, k = 5, efSearch = 64)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    assert(a.sameElements(b))
  }

  test("RFlat factory index round-trips raw vectors and searches identically") {
    import spark.implicits._
    val vs = clusteredVecs(400, 16, nClusters = 8, seed = 77)
    val baseDF = vecDF(vs.take(380))
    val qDF = vecDF(vs.drop(380), "qid")
    val gi = graft.index.IndexFactory.build("IVF8,PQ8,RFlat", baseDF)
    val dir = java.nio.file.Files.createTempDirectory("rflatio").toString
    graft.index.IndexIO.saveIndex(gi, "IVF8,PQ8,RFlat", dir)
    val gi2 = graft.index.IndexIO.loadIndex(dir, spark)
    assert(gi2.spec.refine && gi2.raw.isDefined)
    def run(g: graft.index.IndexFactory.GraftIndex) =
      g.search(qDF, k = 5, nprobe = 8)
        .select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect().sorted
    assert(run(gi).sameElements(run(gi2)))
  }

  test("FlatDedup factory index persists its instances table and searches identically") {
    import spark.implicits._
    // planted duplicates so the instances side table is non-empty
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      base.zipWithIndex.collect { case (v, i) if i % 7 == 0 => (i + 5000L, v) }
    val dupDF = rows.toSeq.toDF("id", "vec").cache()
    val spec = "IVF8,FlatDedup"
    val idx = IndexFactory.build(spec, dupDF)
    assert(idx.instances.nonEmpty && idx.instances.get.count() > 0)
    val path = tmp("dedup")
    IndexIO.saveIndex(idx, spec, path)
    val back = IndexIO.loadIndex(path, spark)
    assert(back.instances.nonEmpty,
      "reloaded dedup index must restore the instances side table")
    assert(back.instances.get.count() == idx.instances.get.count())
    def run(g: IndexFactory.GraftIndex) =
      g.search(qDF, k = 5, nprobe = 8)
        .select(col("qid"), col("rank"), col("id"), col("dist"))
        .as[(Long, Int, Long, Double)].collect().sorted
    assert(run(idx).sameElements(run(back)))
  }

  test("frameDisk builds once, then reloads from parquet across sessions") {
    import spark.implicits._
    val key = s"frameDiskSpec_${System.nanoTime()}"
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val first = graft.index.IndexCache.frameDisk(key, spark, build)
      .as[(Long, String)].collect().sorted
    assert(builds == 1)
    // simulate a fresh JVM: drop the session cache, keep the disk layer
    graft.index.IndexCache.clear()
    val second = graft.index.IndexCache.frameDisk(key, spark, build)
      .as[(Long, String)].collect().sorted
    assert(builds == 1, "reload must come from parquet, not a rebuild")
    assert(first.sameElements(second))
  }
}
