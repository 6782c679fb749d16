package graft

import org.apache.spark.sql.functions._
import graft.ops.{Decontaminate, SequencePack}

/** Benchmark decontamination + sequence-packing layout — the
  * training-data-pipeline rows d09/d10. */
class DecontamPackSpec extends SparkSpec {
  import spark.implicits._

  test("flagContaminated: known overlaps, short docs, broadcast plan") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "zzz alpha beta gamma delta yyy"), // shares 2 distinct 4-grams? windows: [zzz a b g],[a b g d],[b g d yyy] -> 1 hit
      (2L, "alpha beta gamma delta epsilon"), // exact copy: 2 bench 4-grams
      (3L, "totally different words here now"), // clean
      (4L, "alpha beta gamma"), // 3 words < n: no grams
      (5L, "alpha beta gamma delta alpha beta gamma delta") // repeated gram counted once
    ).toDF("doc_id", "text")
    val res = Decontaminate.flagContaminated(train, bench)
    val m = res.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(m(1L) == (1L, true))
    assert(m(2L) == (2L, true))
    assert(m(3L) == (0L, false))
    assert(m(4L) == (0L, false), "sub-n doc has no grams")
    assert(m(5L) == (1L, true), "per-doc distinct grams: repeat counted once")
    assert(res.count() == 5, "every training doc gets a row")
    // the corpus-side join must be a broadcast, never a shuffle of grams
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench gram set not broadcast:\n$plan")
  }

  test("packOffsets: distributed prefix sum == serial scan, any parallelism") {
    val rnd = new scala.util.Random(42)
    val rows = Array.tabulate(500)(i => (i.toLong, (1 + rnd.nextInt(90)).toLong))
    val expectedStarts = rows.map(_._2).scanLeft(0L)(_ + _).init
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toSeq.toDF("doc_id", "n_tokens").repartition(7) // arbitrary input layout
      val out = SequencePack.packOffsets(df, "doc_id", "n_tokens", 64L, parts)
        .orderBy("doc_id").collect()
      assert(out.length == 500)
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) == i.toLong)
        assert(r.getLong(2) == expectedStarts(i),
          s"start_token mismatch at doc $i with $parts partitions")
        val start = r.getLong(2); val tok = r.getLong(1)
        assert(r.getLong(3) == start / 64, "window_id")
        assert(r.getLong(4) == (start + tok - 1) / 64, "end_window")
        assert(r.getBoolean(5) == ((start + tok - 1) / 64 > start / 64), "spans")
      }
    }
  }

  test("s06 streaming decontamination == batch d09, genuinely micro-batched") {
    val dir = sf("sf0.001")
    val streamed = graft.queries.Documents.s06StreamDecontam(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val batch = graft.queries.Documents.d09Decontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(streamed.sameElements(batch),
      "streaming sink union must be bit-identical to the batch answer")
    assert(batch.exists(_._3) && batch.exists(!_._3),
      "fixture should contain both contaminated and clean docs")
  }

  test("d11 vocab: top-K by (tf desc, word), deterministic cutoff") {
    val dir = sf("sf0.001")
    val rows = graft.queries.Documents.d11VocabTop(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // local oracle over the same fixture
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val tf = scala.collection.mutable.Map.empty[String, Long]
    val df = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      ws.foreach(w => tf.update(w, tf.getOrElse(w, 0L) + 1))
      ws.distinct.foreach(w => df.update(w, df.getOrElse(w, 0L) + 1))
    }
    // a fixture vocabulary smaller than the cutoff returns whole-vocab
    assert(rows.length == math.min(graft.queries.Documents.VocabTopK, tf.size))
    val expect = tf.toSeq.map { case (w, c) => (w, c, df(w)) }
      .sortBy { case (w, c, _) => (-c, w) }
      .take(graft.queries.Documents.VocabTopK)
    assert(rows.toSeq == expect)
  }

  test("prepare dedup-chain materialization: gated == ungated, gate engages on parquet") {
    val d = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val D = graft.queries.Documents
    val train = d.filter(col("doc_id") % 10 =!= D.BenchResidue)
    val bench = d.filter(col("doc_id") % 10 === D.BenchResidue)
    val cfgPlain = graft.ops.PreparePipeline.Config(
      stopwords = Seq("the", "a", "of", "and", "or", "is", "to", "in"),
      minStopRatio = 0.02, minTokens = 20, gramN = D.DecontamN,
      windowTokens = D.PackWindow)
    val cfgFuzzy = cfgPlain.copy(fuzzy = Some(graft.ops.PreparePipeline
      .FuzzyDedup(numHashes = 16, bands = 4, minJaccard = 0.8)))
    def rows(cfg: graft.ops.PreparePipeline.Config) =
      graft.ops.PreparePipeline.run(train, bench, cfg)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // gate engaged (fixture bytes ≪ default cap) on the FUZZY shape:
    // the post-gate dedup chain is snapshot-backed — the survivors
    // plan shows an RDD scan. The plain shape keeps the re-scan
    // (measured strictly cheaper without the fuzzy consumers).
    val fuzzyPlan = graft.ops.PreparePipeline
      .cleanCorpus(train, bench, cfgFuzzy).queryExecution.optimizedPlan.toString
    assert(fuzzyPlan.contains("LogicalRDD"),
      s"materialization gate did not engage on fuzzy parquet input:\n$fuzzyPlan")
    val plainPlan = graft.ops.PreparePipeline
      .cleanCorpus(train, bench, cfgPlain).queryExecution.optimizedPlan.toString
    assert(!plainPlan.contains("LogicalRDD"),
      s"plain (no-fuzzy) shape must keep the re-scan:\n$plainPlan")
    val gatedPlain = rows(cfgPlain)
    val gatedFuzzy = rows(cfgFuzzy)
    val prop = "graft.prepare.materializeMaxBytes"
    sys.props(prop) = "0"
    try {
      assert(rows(cfgPlain) == gatedPlain,
        "plain pipeline must be row-identical with materialization off")
      assert(rows(cfgFuzzy) == gatedFuzzy,
        "fuzzy pipeline must be row-identical with materialization off")
    } finally sys.props -= prop
    assert(gatedPlain.nonEmpty && gatedFuzzy.nonEmpty)
  }

  test("contaminatedIds == flagContaminated's flagged set") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "zzz alpha beta gamma delta yyy"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now"),
      (4L, "alpha beta gamma"),
      (5L, "alpha beta gamma delta alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val viaFlag = Decontaminate.flagContaminated(train, bench)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val direct = Decontaminate.contaminatedIds(train, bench)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(direct == viaFlag && direct == Seq(1L, 2L, 5L))
    val plan = Decontaminate.contaminatedIds(train, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench gram set not broadcast:\n$plan")
  }

  test("hashGrams: xxhash64-keyed decontamination == string-keyed, same broadcast plan") {
    // the petabyte-scale key promised by the object doc: 8-byte join
    // keys, identical plan shape, identical answers on real text
    val d = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val D = graft.queries.Documents
    val train = d.filter(col("doc_id") % 10 =!= D.BenchResidue)
    val bench = d.filter(col("doc_id") % 10 === D.BenchResidue)
    val viaString = Decontaminate.flagContaminated(train, bench)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val hashed = Decontaminate.flagContaminated(train, bench, hashGrams = true)
    val viaHash = hashed
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(viaString.exists(_._3) && viaString.exists(!_._3),
      "fixture should contain both contaminated and clean docs")
    assert(viaHash.sameElements(viaString),
      "hashed-gram flags diverge from string-gram flags")
    val idsString = Decontaminate.contaminatedIds(train, bench)
      .collect().map(_.getLong(0)).sorted.toSeq
    val idsHash = Decontaminate.contaminatedIds(train, bench, hashGrams = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(idsHash == idsString)
    // hashed path keeps the broadcast-join shape, with LONG keys
    val plan = hashed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hashed bench gram set not broadcast:\n$plan")
    assert(plan.contains("xxhash64"), s"hashed key projection missing:\n$plan")
  }

  test("d12 prepare e2e: stage invariants over the fixture corpus") {
    val dir = sf("sf0.001")
    val D = graft.queries.Documents
    val out = D.d12PrepareE2e(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "e2e output empty — fixture filters too strict?")
    // packing invariant: contiguous cumsum in doc_id order, starting at 0
    assert(out.sortBy(_._1).sameElements(out), "output not doc_id-ordered")
    var run = 0L
    out.foreach { case (_, tok, start) =>
      assert(start == run, s"offset gap at start=$start expected $run")
      run += tok
    }
    val outIds = out.map(_._1).toSet
    // no benchmark-side doc, and every survivor passes the quality gate
    assert(outIds.forall(_ % 10 != D.BenchResidue))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sw = Set("the", "a", "of", "and", "or", "is", "to", "in")
    outIds.foreach { id =>
      val ws = docs(id).split(" ", -1)
      assert(ws.length >= 20 &&
        ws.count(sw).toDouble / ws.length >= 0.02, s"doc $id fails quality gate")
    }
    // no contaminated survivor: recompute the bad set independently
    def grams(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < D.DecontamN) Set.empty
      else ws.sliding(D.DecontamN).map(_.mkString(" ")).toSet
    }
    val benchGrams = docs.collect {
      case (id, t) if id % 10 == D.BenchResidue => grams(t)
    }.foldLeft(Set.empty[String])(_ ++ _)
    outIds.foreach { id =>
      assert(grams(docs(id)).intersect(benchGrams).isEmpty,
        s"contaminated doc $id survived")
    }
    // dedup: survivors' normalized texts are pairwise distinct, and each
    // survivor is the SMALLEST quality-passing doc_id for its text
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ").trim
    val normOf = outIds.map(id => id -> norm(docs(id))).toMap
    assert(normOf.values.toSeq.distinct.size == outIds.size, "duplicate texts survived")
    val qualIds = docs.keySet.filter { id =>
      val ws = docs(id).split(" ", -1)
      id % 10 != D.BenchResidue && ws.length >= 20 &&
        ws.count(sw).toDouble / ws.length >= 0.02
    }
    outIds.foreach { id =>
      val minDup = qualIds.filter(q => norm(docs(q)) == normOf(id)).min
      assert(id == minDup, s"kept $id but smallest duplicate is $minDup")
    }
  }

  test("prepare pipeline degenerate inputs: empty bench, nothing-survives corpus") {
    val sw = Seq("the", "a", "of", "and", "or", "is", "to", "in")
    val longDoc = (0 until 30).map(i => if (i % 10 == 0) "the" else s"w$i").mkString(" ")
    val corpus = Seq((1L, longDoc), (2L, longDoc + " tail"), (3L, "too short"))
      .toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // empty benchmark: decontamination is a no-op, quality gate still applies
    val out = graft.ops.PreparePipeline
      .run(corpus, emptyBench, sw, 0.02, 20, 4, 64L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.head.getLong(2) == 0L, "first survivor starts at offset 0")
    // nothing survives the gate: the packed frame is empty, not a crash
    val shorts = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val none = graft.ops.PreparePipeline
      .run(shorts, emptyBench, sw, 0.02, 20, 4, 64L)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("doc_id", "n_tokens", "start_token",
      "window_id", "end_window", "spans_boundary"))
    // a benchmark that hits every survivor: empty output again, by decontam
    val allBench = Seq((9L, longDoc), (10L, longDoc + " tail")).toDF("doc_id", "text")
    assert(graft.ops.PreparePipeline
      .run(corpus, allBench, sw, 0.02, 20, 4, 64L).count() == 0L)
    // fuzzy stage over an empty survivor set: no candidates, no edges,
    // a zero-round components fixpoint — empty output, not a crash
    val fuzzyCfg = graft.ops.PreparePipeline.Config(sw, 0.02, 20, 4, 64L,
      fuzzy = Some(graft.ops.PreparePipeline.FuzzyDedup()))
    assert(graft.ops.PreparePipeline.run(shorts, emptyBench, fuzzyCfg)
      .count() == 0L)
  }

  test("pipeline Config: hashGrams=true output ≡ default, hashed plan reaches the DAG") {
    import graft.ops.PreparePipeline
    val d = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val D = graft.queries.Documents
    val train = d.filter(col("doc_id") % 10 =!= D.BenchResidue)
    val bench = d.filter(col("doc_id") % 10 === D.BenchResidue)
    val sw = Seq("the", "a", "of", "and", "or", "is", "to", "in")
    def rows(cfg: PreparePipeline.Config) =
      PreparePipeline.run(train, bench, cfg).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = PreparePipeline.Config(sw, 0.02, 20, D.DecontamN, 64L)
    val default = rows(base)
    val hashed = rows(base.copy(hashGrams = true))
    assert(default.nonEmpty)
    assert(hashed.sameElements(default),
      "hashGrams=true must not change the composed pipeline's output")
    // the knob actually reaches the decontam stage inside the DAG
    val plan = PreparePipeline
      .cleanCorpus(train, bench, base.copy(hashGrams = true))
      .queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"),
      s"hashed gram keys missing from the composed plan:\n$plan")
  }

  test("pipeline fuzzy near-dup stage: transitive chain collapses to min-id rep; checkpointDir path identical") {
    import graft.ops.PreparePipeline
    val sw = Seq("the", "a", "of", "and", "or", "is", "to", "in")
    def doc(edits: Map[Int, String]): String =
      (0 until 40).map { i =>
        edits.getOrElse(i, if (i % 10 == 0) "the" else s"w$i")
      }.mkString(" ")
    // 1≈2 (one word changed) and 2≈3 (one more) — 1 vs 3 differ by two
    // words; the transitive closure must still put all three in one
    // cluster. 4 is unrelated; 5 is an EXACT duplicate of 1 (the exact
    // stage, not the fuzzy stage, must absorb it, keeping min id 1).
    val corpus = Seq(
      (1L, doc(Map.empty)),
      (2L, doc(Map(5 -> "x5"))),
      (3L, doc(Map(5 -> "x5", 25 -> "x25"))),
      (4L, (0 until 40).map(i => if (i % 10 == 0) "of" else s"z$i").mkString(" ")),
      (5L, doc(Map.empty))).toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val fz = PreparePipeline.FuzzyDedup(numHashes = 64, bands = 16,
      minJaccard = 0.6)
    val base = PreparePipeline.Config(sw, 0.02, 20, 4, 1024L,
      fuzzy = Some(fz))
    def ids(cfg: PreparePipeline.Config): Seq[Long] =
      PreparePipeline.run(corpus, emptyBench, cfg)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(base) == Seq(1L, 4L),
      "fuzzy stage must keep exactly the cluster rep (1) and the unrelated doc (4)")
    // without the stage the near-dups survive (only the exact twin drops)
    assert(ids(base.copy(fuzzy = None)) == Seq(1L, 2L, 3L, 4L))
    // checkpointDir threads through to Components: identical output on
    // the reliable-checkpoint path
    val ckDir =
      java.nio.file.Files.createTempDirectory("prep_fuzzy_ck").toString
    assert(ids(base.copy(fuzzy = Some(fz.copy(checkpointDir = Some(ckDir)))))
      == Seq(1L, 4L), "checkpointDir path must produce identical survivors")
  }

  test("pipeline fuzzy maxBucket cap: oversized band buckets drop candidacy; headroom cap is a no-op") {
    import graft.ops.PreparePipeline
    val sw = Seq("the", "a", "of", "and", "or", "is", "to", "in")
    def doc(edits: Map[Int, String]): String =
      (0 until 40).map { i =>
        edits.getOrElse(i, if (i % 10 == 0) "the" else s"w$i")
      }.mkString(" ")
    // 1≈2 near-dups (one word changed); 3 unrelated
    val corpus = Seq(
      (1L, doc(Map.empty)),
      (2L, doc(Map(5 -> "x5"))),
      (3L, (0 until 40).map(i => if (i % 10 == 0) "of" else s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    def ids(fz: PreparePipeline.FuzzyDedup): Seq[Long] =
      PreparePipeline.run(corpus, emptyBench,
        PreparePipeline.Config(sw, 0.02, 20, 4, 1024L, fuzzy = Some(fz)))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val fz = PreparePipeline.FuzzyDedup(numHashes = 64, bands = 16,
      minJaccard = 0.6)
    // headroom cap (default 8192): buckets of ≤2 never hit it — 2 drops
    assert(ids(fz) == Seq(1L, 3L))
    // cap of 1: EVERY shared bucket is "oversized" → no candidates → the
    // near-dup pair loses LSH candidacy and both docs survive (the
    // documented recall trade; exact dups were absorbed upstream)
    assert(ids(fz.copy(maxBucket = 1)) == Seq(1L, 2L, 3L),
      "maxBucket=1 must drop every band bucket from candidate generation")
  }

  test("PipeScale closed-form harnesses hold at spec scale (e2e 20k, semdedup 20k, fuzzy 20k)") {
    // the same planted-structure accounting the 20M/2M evidence runs
    // use (r13_prepare_e2e_20m.log, r13_semdedup_2m.log,
    // r16_fuzzydedup_20m.log) — require()s inside throw on any
    // count/plan/recall mismatch
    graft.tools_dev.PipeScale.e2e(spark, 20000, 20)
    graft.tools_dev.PipeScale.semdedup(spark, 20000, 32)
    graft.tools_dev.PipeScale.fuzzy(spark, 20000, 50, 41)
  }

  test("packOffsets: spans_boundary marks exactly the chunk-split docs") {
    // tokens 10 each, window 32: docs at offsets 30,60,... straddle
    val df = (0L until 20L).map(i => (i, 10L)).toDF("doc_id", "n_tokens")
    val out = SequencePack.packOffsets(df, "doc_id", "n_tokens", 32L, 4)
      .orderBy("doc_id").collect()
    val spans = out.filter(_.getBoolean(5)).map(_.getLong(0)).toSeq
    // starts: 0,10,20,30,...; doc straddles iff (start%32)+10 > 32
    val expect = (0L until 20L).filter(i => (i * 10 % 32) + 10 > 32)
    assert(spans == expect, s"got $spans want $expect")
  }
}
