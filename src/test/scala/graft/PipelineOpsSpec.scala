package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TextAnalysis}
import graft.queries.{Documents, Vector => VQ}
import graft.search.FlatSearch

/** Dataset-mixing sampling, repetition signals, and streaming k-NN
  * serving — the round-13 training-data-pipeline additions. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("stratifiedSample: deterministic, rate-accurate, map-side only") {
    val rates = Map("src0" -> 10000, "src1" -> 0)
    val a = Sampling.stratifiedSample(docs, "source", "doc_id", rates, 5000)
    val b = Sampling.stratifiedSample(
      docs.repartition(7), "source", "doc_id", rates, 5000)
    // membership is a property of the row — identical under any
    // partitioning / execution order
    assert(a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val bySrc = a.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == totals("src0"), "rate 10000 keeps everything")
    assert(!bySrc.contains("src1"), "rate 0 keeps nothing")
    // default-rate sources land near 50% (binomial tolerance on the
    // small sf0.001 strata)
    val defKept = bySrc.filter(kv => kv._1 != "src0" && kv._1 != "src1").values.sum
    val defTotal = totals.filter(kv => kv._1 != "src0" && kv._1 != "src1").values.sum
    val frac = defKept.toDouble / defTotal
    assert(frac > 0.3 && frac < 0.7, s"default-rate fraction $frac")
    // the selection itself is one map-side filter: no shuffle in the plan
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling plan shuffles:\n$plan")
  }

  test("trainValSplit: total, disjoint, independent of the sample hash") {
    val split = docs.select(col("doc_id"),
      Sampling.trainValSplit(col("doc_id"), 9000).as("split"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum == n, "every row assigned")
    val trainFrac = counts.getOrElse("train", 0L).toDouble / n
    assert(trainFrac > 0.8 && trainFrac < 0.98, s"train fraction $trainFrac")
    // independence from the sampling bucketing: among rows the sampler
    // keeps at 50%, the split fraction stays near 90% (same multiplier
    // would make the val set a deterministic function of membership)
    val sampled = Sampling.stratifiedSample(docs, "source", "doc_id",
      Map.empty, 5000).select(col("doc_id"),
      Sampling.trainValSplit(col("doc_id"), 9000).as("split"))
    val sCounts = sampled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sFrac = sCounts.getOrElse("train", 0L).toDouble / sCounts.values.sum
    assert(sFrac > 0.8 && sFrac < 0.98, s"train fraction within sample $sFrac")
  }

  test("repetitionSignals matches a naive per-doc count") {
    val rows = TextAnalysis.repetitionSignals(docs).collect()
    assert(rows.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val ws = texts(r.getLong(0)).split(" ", -1)
      val grams = ws.sliding(2).map(_.mkString(" ")).toSeq
      assert(r.getLong(1) == grams.size, s"n_bigrams doc ${r.getLong(0)}")
      assert(r.getLong(2) == grams.distinct.size, s"n_distinct doc ${r.getLong(0)}")
      val top = grams.groupBy(identity).values.map(_.size).max
      assert(r.getDouble(4) == top.toDouble / grams.size, s"top_frac doc ${r.getLong(0)}")
      assert(r.getDouble(3) ==
        (grams.size - grams.distinct.size).toDouble / grams.size)
    }
    // docs with fewer than two words are out of domain (no bigrams)
    val nShort = docs.filter(size(split(col("text"), " ", -1)) < 2).count()
    assert(rows.length == texts.size - nShort)
  }

  test("repetitive flag fires on looped text and not on distinct text") {
    val crafted = Seq(
      (1L, ("spam ham " * 30).trim),             // one bigram dominates
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")) // all distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(crafted).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(1L) && !out(2L))
  }

  /** Runs `f` with the Components driver union-find arm disabled, so
    * the DISTRIBUTED pointer-jumping loop is what executes. */
  private def ccDistributed[T](f: => T): T = {
    sys.props("graft.components.driverMaxEdges") = "0"
    try f finally sys.props -= "graft.components.driverMaxEdges"
  }

  test("connectedComponents matches union-find on a crafted graph (both arms)") {
    // two chains (transitive closure beyond any single edge), a
    // triangle, and an isolated edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (11L, 12L),                     // chain 10-11-12
      (20L, 21L), (21L, 22L), (20L, 22L),         // triangle
      (30L, 31L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L)
    val driver = graft.ops.Components.connectedComponents(edges)
    assert(driver.converged && driver.rounds == 0) // driver arm engaged
    assert(driver.labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    val dist = ccDistributed(graft.ops.Components.connectedComponents(edges))
    assert(dist.converged && dist.rounds > 0) // distributed loop engaged
    assert(dist.labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
  }

  test("connectedComponents matches union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // expected label = min node id per union-find component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOf = nodes.groupBy(x => find(x.toInt))
      .map { case (r, xs) => r -> xs.min }
    val expect = nodes.map(x => x -> minOf(find(x.toInt))).toMap
    // distributed loop (the driver arm IS a union-find — exercising it
    // against this reference would be a tautology)
    val res = ccDistributed(
      graft.ops.Components.connectedComponents(edges.toDF("a", "b")))
    assert(res.converged)
    val got = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // and the driver arm agrees with the same reference
    val drv = graft.ops.Components.connectedComponents(edges.toDF("a", "b"))
    assert(drv.rounds == 0 &&
      drv.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
  }

  test("connectedComponents: null endpoints dropped identically on both arms") {
    // inner-join semantics on the distributed loop drop null-keyed
    // rows; the driver arm must match instead of NPE-ing on collect
    val edges = Seq(
      (Option(1L), Option(2L)), (Option(2L), Option(3L)),
      (None: Option[Long], Option(9L)), (Option(7L), None: Option[Long]),
      (Option(10L), Option(11L))).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    val drv = graft.ops.Components.connectedComponents(edges)
    assert(drv.rounds == 0 && drv.labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    val dist = ccDistributed(graft.ops.Components.connectedComponents(edges))
    assert(dist.labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
  }

  test("connectedComponents: reliable checkpoint() path == localCheckpoint path") {
    // the fault-tolerant cluster mode: per-round snapshots go to a
    // checkpoint store instead of executor-local storage; labels must
    // be identical (the snapshot mechanism is not part of the answer)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // the checkpoint modes only exist on the distributed loop — the
    // driver arm has no per-round snapshots to store
    val (reliable, local) = ccDistributed {
      (graft.ops.Components
        .connectedComponents(edges, checkpointDir = Some(dir)),
        graft.ops.Components.connectedComponents(edges))
    }
    assert(reliable.converged && local.converged)
    assert(reliable.rounds == local.rounds)
    val a = reliable.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = local.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"checkpoint modes diverge: ${a.toSet diff b.toSet}")
    // and the reliable run actually wrote checkpoint data
    def nonEmpty(f: java.io.File): Boolean = {
      val kids = Option(f.listFiles).getOrElse(Array.empty)
      kids.exists(k => k.isFile || nonEmpty(k))
    }
    assert(nonEmpty(new java.io.File(dir)), "no reliable checkpoint files written")
  }

  test("maxIter guard reports non-convergence on a long chain") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val res = ccDistributed(
      graft.ops.Components.connectedComponents(chain, maxIter = 3))
    assert(!res.converged && res.rounds == 3)
  }

  test("fuzzy oversized-band-key cap: join fallback ≡ collected broadcast") {
    // base text long enough for stable 3-shingle overlap; four A docs
    // are pairwise near-dups differing in ONE trailing word (they
    // survive exact dedup but co-land in band buckets of size 4 >
    // maxBucket=2 → flagged oversized); the B pair shares buckets of
    // size 2 → kept, so the fuzzy stage still drops one doc either way
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$base alpha"), (2L, s"$base beta"),
      (3L, s"$base gamma"), (4L, s"$base delta"),
      (10L, s"zz yy xx " + (1 to 27).map(i => s"q$i").mkString(" ")),
      (11L, s"zz yy xx " + (1 to 27).map(i => s"q$i").mkString(" ") + " end")
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "completely unrelated benchmark text here"))
      .toDF("doc_id", "text")
    val cfg = graft.ops.PreparePipeline.Config(
      stopwords = Seq("w1"), minStopRatio = 0.0, minTokens = 3, gramN = 4,
      windowTokens = 0L,
      fuzzy = Some(graft.ops.PreparePipeline.FuzzyDedup(
        numHashes = 8, bands = 4, minJaccard = 0.5, maxBucket = 2)))
    def run(): Set[Long] = graft.ops.PreparePipeline
      .cleanCorpus(corpus, bench, cfg)
      .select("doc_id").as[Long].collect().toSet
    val viaCollect = run()
    val savedCap = graft.ops.PreparePipeline.bandKeyCollectCap
    val viaJoin =
      try { graft.ops.PreparePipeline.bandKeyCollectCap = 0; run() }
      finally graft.ops.PreparePipeline.bandKeyCollectCap = savedCap
    assert(viaJoin == viaCollect,
      s"fallback diverged: only-join=${viaJoin -- viaCollect} " +
        s"only-collect=${viaCollect -- viaJoin}")
    assert(!viaCollect.contains(11L), "B near-dup pair must collapse to 10")
    assert(viaCollect.contains(10L))
  }

  test("pointer jumping: 120-member chain converges in O(log n) rounds") {
    // the r16 failure mode: plain min-label propagation needs
    // diameter-many rounds, so a 120-node chain blew past maxIter=20.
    // With the prev-labels pointer jump the covered distance roughly
    // doubles per round, so this must converge well inside the default
    // budget — and exactly (every node labeled 0).
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val res = ccDistributed(graft.ops.Components.connectedComponents(chain))
    assert(res.converged, s"did not converge in ${res.rounds} rounds")
    assert(res.rounds <= 8, s"expected ≤8 rounds, took ${res.rounds}")
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 121 && labels.forall(_._2 == 0L))
  }

  test("s05 streaming serve ≡ one-shot batch knn, and actually micro-batches") {
    val dir = sf("sf0.001")
    val streamed = VQ.s05StreamKnn(spark, dir).collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val batch = FlatSearch.knn(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      emb.filter(col("vec_id") < 64)
        .select(col("vec_id").as("qid"), col("embedding").as("vec")),
      k = 10).orderBy(col("qid"), col("rank")).collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1) &&
        s.getDouble(2) == b.getDouble(2) && s.getInt(3) == b.getInt(3))
    }
  }
}
