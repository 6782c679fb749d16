package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: scale evidence for the r13 pipeline additions.
  *
  * `pack N` — SequencePack.packOffsets over N synthetic (id, tokens)
  * rows at P=256: times the two-pass distributed prefix sum, checks the
  * global invariants (min start = 0, max(start+tokens) = Σtokens, row
  * count preserved), and — the exactness proof — recomputes with P=1
  * (single range partition ⇒ trivially-correct serial scan) and
  * anti-joins the two offset sets: 0 mismatching rows means the
  * distributed offsets ARE the serial offsets at N.
  *
  * `decontam N B` — Decontaminate.flagContaminated over N synthetic
  * ~40-word documents against a B-document benchmark set: times the
  * broadcast-gram flagging at corpus scale and prints the contaminated
  * count (deterministic for fixed seeds).
  *
  * run: sbt "runMain graft.tools_dev.PipeScale pack 20000000"
  *      sbt "runMain graft.tools_dev.PipeScale decontam 2000000 500"
  */
object PipeScale {
  def main(args: Array[String]): Unit = {
    // PIPESCALE_CPUS: core-count scaling evidence (VERDICT r17 #8) —
    // the sf0.1 bench rows are fixed-cost-bound (8c/32c ratio ≈ 1
    // everywhere), so parallel-scaling claims route through these
    // generator-backed rehearsals at sizes where compute dominates:
    // run the same command at 32 and 8 cores and compare walls.
    val cpus = sys.env.getOrElse("PIPESCALE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.maxResultSize", "4g")
      // long multi-job rehearsals: reclaim unreferenced shuffle files
      // promptly (plan-truncating checkpoints drop the references; the
      // default 30min GC let the r16 fuzzy run fill the disk)
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some("pack")     => pack(spark, args(1).toLong)
      case Some("decontam") => decontam(spark, args(1).toLong, args(2).toInt)
      case Some("e2e")      => e2e(spark, args(1).toLong, args(2).toInt)
      case Some("semdedup") => semdedup(spark, args(1).toLong, args(2).toInt,
        if (args.length > 3) args(3).toInt else 8192)
      case Some("fuzzy")    => fuzzy(spark, args(1).toLong, args(2).toInt,
        if (args.length > 3) args(3).toInt else 41)
      case _ => sys.error("usage: PipeScale pack N | decontam N B | e2e N B" +
        " | semdedup N nlist [maxList] | fuzzy N chains [len]")
    }
    spark.stop()
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pipescale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def pack(spark: SparkSession, n: Long): Unit = {
    println(s"[pipescale] pack n=$n")
    // deterministic token counts in [50, 250)
    val base = spark.range(n).toDF("doc_id")
      .withColumn("n_tokens", col("doc_id") * 2654435761L % 200L + 50L)
    val dist = timed(s"packOffsets P=256, n=$n") {
      val r = graft.ops.SequencePack
        .packOffsets(base, "doc_id", "n_tokens", 2048L, 256)
      r.cache().count()
      r
    }
    val inv = dist.agg(
      count(lit(1)).as("rows"),
      min(col("start_token")).as("minStart"),
      max(col("start_token") + col("n_tokens")).as("maxEnd"),
      sum(col("n_tokens")).as("total")).collect()(0)
    println(s"[pipescale] invariants: rows=${inv.getLong(0)} " +
      s"minStart=${inv.getLong(1)} maxEnd=${inv.getLong(2)} total=${inv.getLong(3)}")
    require(inv.getLong(0) == n && inv.getLong(1) == 0L &&
      inv.getLong(2) == inv.getLong(3), "global coverage invariants broken")
    // exactness vs the serial scan: P=1 is one range partition — the
    // prefix sum degenerates to a single in-order pass
    val serial = timed(s"packOffsets P=1 (serial oracle), n=$n") {
      val r = graft.ops.SequencePack
        .packOffsets(base, "doc_id", "n_tokens", 2048L, 1)
      r.cache().count()
      r
    }
    val mismatches = timed("offset equality join") {
      dist.alias("a").join(serial.alias("b"), Seq("doc_id"))
        .filter(col("a.start_token") =!= col("b.start_token"))
        .count()
    }
    println(s"[pipescale] mismatching offsets vs serial: $mismatches")
    require(mismatches == 0L, "distributed offsets differ from serial scan")
    val spans = dist.filter(col("spans_boundary")).count()
    println(s"[pipescale] spans_boundary docs: $spans (${100.0 * spans / n}%)")
  }

  /** `e2e N B` — the composed prepare pipeline (PreparePipeline.run,
    * the exact d12 production path) over N synthetic docs with PLANTED
    * structure whose survivor count has a closed form computable by a
    * driver-side integer loop (an oracle independent of the DataFrame
    * pipeline):
    *
    *  - sid(id) = id-1 if id%100==1 else id → 1% exact-duplicate pairs
    *    (text is a pure function of sid);
    *  - docs whose sid%97==3 are 10 words (fail the min-20 gate),
    *    everything else 40 words with 'the' at every 10th position
    *    (stop_ratio 0.1 ≥ 0.02: gate passes);
    *  - benchmark doc j carries id 211j+5, which the same sid mapping
    *    turns into state t = sid(211j+5); a targeted state t removes
    *    EXACTLY ONE survivor iff t<N and t%97 != 3 (its train carrier
    *    passed the gate — post-mapping t never ≡1 mod 100, so a
    *    carrier always exists), counting each distinct t once;
    *  - vocabulary 100k ⇒ accidental cross-state 4-gram collisions
    *    have expectation ≪ 1 at N=2e7 (≈ (N·37)(B·37)/1e15·phases).
    *
    * expected rows = |{s<N : s%100≠1, s%97≠3}|
    *               − |{t = sid(211j+5) : j<B, t<N, t%97≠3}|
    * expected total tokens = 40 × expected rows. */
  def e2e(spark: SparkSession, n: Long, b: Int): Unit = {
    println(s"[pipescale] e2e n=$n bench=$b")
    val gen = udf { (sid: Long, nw: Int) =>
      val sb = new StringBuilder
      var i = 0
      while (i < nw) {
        if (i > 0) sb.append(' ')
        if (i % 10 == 0) sb.append("the")
        else {
          // mixed hash — a LINEAR map of sid would repeat whole texts
          // with period |vocab| in sid and flood dedup with collisions
          var h = sid * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL
          h ^= h >>> 32; h *= 0xD6E8FEB86659FD93L; h ^= h >>> 32
          sb.append("w").append(Math.floorMod(h, 100000L))
        }
        i += 1
      }
      sb.result()
    }
    def docsOf(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("sid", when(col("doc_id") % 100 === 1, col("doc_id") - 1)
        .otherwise(col("doc_id")))
      .withColumn("nw", when(col("sid") % 97 === 3, lit(10)).otherwise(lit(40)))
      .select(col("doc_id"), gen(col("sid"), col("nw")).as("text"))
    val train = docsOf(spark.range(n).toDF("doc_id"))
    val bench = docsOf(spark.range(b.toLong).select((col("id") * 211 + 5)
      .as("doc_id"))) // replayed states ⇒ planted contamination
    val out = timed(s"prepare e2e n=$n b=$b") {
      val r = graft.ops.PreparePipeline.run(
        train, bench,
        stopwords = Seq("the", "a", "of", "and", "or", "is", "to", "in"),
        minStopRatio = 0.02, minTokens = 20, gramN = 4,
        windowTokens = 2048L, packParts = 256)
      r.cache().count()
      r
    }
    val inv = out.agg(
      count(lit(1)).as("rows"),
      min(col("start_token")).as("minStart"),
      max(col("start_token") + col("n_tokens")).as("maxEnd"),
      sum(col("n_tokens")).as("total")).collect()(0)
    println(s"[pipescale] rows=${inv.getLong(0)} minStart=${inv.getLong(1)} " +
      s"maxEnd=${inv.getLong(2)} totalTokens=${inv.getLong(3)}")
    // closed-form oracle: a plain integer loop on the driver
    var expected = 0L
    var s = 0L
    while (s < n) {
      if (s % 100 != 1 && s % 97 != 3) expected += 1
      s += 1
    }
    val targeted = scala.collection.mutable.Set.empty[Long]
    var j = 0L
    while (j < b) {
      val t0 = 211L * j + 5
      val t = if (t0 % 100 == 1) t0 - 1 else t0 // mirror docsOf's sid rule
      if (t < n && t % 97 != 3) targeted += t
      j += 1
    }
    expected -= targeted.size
    println(s"[pipescale] expected survivors (closed form): $expected")
    require(inv.getLong(0) == expected,
      s"survivor count ${inv.getLong(0)} != closed-form $expected")
    require(inv.getLong(1) == 0L && inv.getLong(2) == inv.getLong(3) &&
      inv.getLong(3) == 40L * expected, "packing invariants broken")
    // the packed frame is RDD-backed, so audit the pre-pack stages
    val clean = graft.ops.PreparePipeline.cleanCorpus(
      train, bench, Seq("the", "a", "of", "and", "or", "is", "to", "in"),
      minStopRatio = 0.02, minTokens = 20, gramN = 4)
    clean.count() // materialize so AQE finalizes join strategies
    val plan = clean.queryExecution.executedPlan.toString
    require(plan.contains("BroadcastHashJoin"), s"bench grams not broadcast:\n$plan")
    println("[pipescale] plan: broadcast gram join confirmed; pipeline count exact")
  }

  /** `semdedup N nlist` — EmbeddingDedup.ivfPairs (the v32 production
    * path) at corpus scale: N spread 64-dim vectors (the LshScale
    * corpus shape — per-id noise over 256 cluster means, realistic for
    * embeddings) with an identical twin planted at every 100th id.
    * k-means trains on a deterministic ~5% sample (training cost is
    * sample-bound, assignment streams the corpus once), then the
    * within-list pair join runs with exact cosine at 0.99.
    *
    * Checks: every planted twin pair is found (identical vectors
    * assign to identical lists — recall 1.0 by construction,
    * independent of clustering quality); extras are reported with
    * their cosine range (legitimately-similar corpus pairs, not false
    * positives — the threshold is the definition); the max list size
    * is printed because it bounds per-task pair work.
    *
    * r14: also audits the oversized-list guard — lists over `maxList`
    * take the banded sub-split, so the printed per-task pair bound is
    * `max(maxNormalList, maxBucket)²/2` instead of `maxList²·skew/2`;
    * planted-twin recall must STAY 1.0 through the guard (identical
    * vectors ride the in-guard exact-dup candidate pass). */
  def semdedup(spark: SparkSession, n: Long, nlist: Int,
               maxList: Int = 8192): Unit = {
    println(s"[pipescale] semdedup n=$n nlist=$nlist maxList=$maxList")
    val d = 64
    val nClusters = 256
    val gen = udf { (id: Long) =>
      val r = new scala.util.Random(id * 2654435761L + 42)
      val c = new scala.util.Random((id % nClusters) * 7919 + 1)
      Array.fill(d)((c.nextGaussian() + 1.0 * r.nextGaussian()).toFloat)
    }
    val baseDF = spark.range(n).toDF("id").withColumn("vec", gen(col("id"))).cache()
    baseDF.count()
    val planted = baseDF.filter(col("id") % 100 === 0)
      .select((col("id") + n).as("id"), col("vec"))
    val corpus = baseDF.unionByName(planted).cache()
    val nPlanted = planted.count()
    val sample = baseDF.filter(col("id") % 20 === 0) // deterministic ~5%
    val model = timed(s"kmeans train (sample=${n / 20}, k=$nlist)") {
      graft.index.IVFIndex.train(sample, nlist = nlist)
    }
    val assigned = timed("assign corpus") {
      val a = graft.index.IVFIndex.assign(corpus, model).cache()
      a.count(); a
    }
    val sizes = assigned.groupBy(col("list_no")).count().cache()
    val biggest = sizes.agg(max(col("count"))).collect()(0).getLong(0)
    val nOver = sizes.filter(col("count") > maxList).count()
    // coalesce: if EVERY list is oversized (the extreme-skew regime the
    // guard targets) the filtered max is NULL and getLong would NPE
    val maxNormal = sizes.filter(col("count") <= maxList)
      .agg(coalesce(max(col("count")), lit(0L))).collect()(0).getLong(0)
    sizes.unpersist()
    println(s"[pipescale] max list size: $biggest (mean ${(n + nPlanted) / nlist})")
    println(s"[pipescale] guard: $nOver lists over maxList=$maxList take " +
      s"sub-k-means refinement; every all-pairs cell <= maxList -> per-task " +
      s"pair work <= maxList^2/2 = ${maxList.toLong * maxList / 2} " +
      s"(max unguarded list $maxNormal)")
    val pairs = timed(s"ivfPairs threshold=0.99") {
      val p = graft.ops.EmbeddingDedup
        .ivfPairs(assigned, threshold = 0.99, maxList = maxList).cache()
      p.count(); p
    }
    val total = pairs.count()
    // planted pair = (i, i+n) for i % 100 == 0
    val plantedFound = pairs
      .filter(col("b") === col("a") + n && col("a") % 100 === 0).count()
    println(s"[pipescale] pairs=$total plantedFound=$plantedFound of $nPlanted")
    require(plantedFound == nPlanted,
      s"missed planted twins: $plantedFound of $nPlanted")
    val extras = total - plantedFound
    if (extras > 0) {
      val ex = pairs.filter(!(col("b") === col("a") + n && col("a") % 100 === 0))
        .agg(min(col("cos")), max(col("cos"))).collect()(0)
      println(s"[pipescale] extras=$extras cos in [${ex.get(0)}, ${ex.get(1)}] " +
        "(genuinely >= threshold corpus pairs, not false positives)")
    } else println("[pipescale] extras=0")
    baseDF.unpersist(); corpus.unpersist(); assigned.unpersist(); pairs.unpersist()
  }

  /** `fuzzy N chains [len]` — the PreparePipeline near-dup stage
    * (`Config.fuzzy`, the d13 production path) at corpus scale, with
    * PLANTED transitive near-dup chains whose collapse has a closed
    * form:
    *
    *  - `chains` sliding-window chains of `len` members each: chain c
    *    owns a private stream of 40+(len−1) globally-unique words;
    *    member j is the 40-word window starting at offset j (slide 1).
    *    Consecutive members share 37 of 39 shingles (J = 37/39 =
    *    0.949), so at minJaccard 0.4 with 16 hashes in 8 two-hash
    *    bands a consecutive edge misses with probability ≈ 1e-8
    *    (band-miss (1−0.949²)⁸ plus est-miss P(<7 of 16 agree));
    *    offset-m members share J = (38−m)/(38+m) — ~10 redundant
    *    skip edges bridge every boundary. A first 20M attempt used
    *    slide-2 windows with skip similarities sitting AT the est
    *    threshold margin: per-edge binomial misses there run 1e-3…0.4
    *    and minhash agreement is CORRELATED across edges crossing one
    *    boundary (they share hash draws), so ~1e-5 of boundaries cut
    *    — 19 extra survivors in 2M, a measured lesson in LSH recall
    *    margins recorded in the evidence log. The ENDPOINTS (offset
    *    len−1 ≥ 40 for len ≥ 41) share ZERO shingles — no estimated
    *    similarity and, structurally, no shared band key is possible
    *    (disjoint shingle sets hash to different md5 minima), which
    *    the harness verifies directly;
    *  - the remaining N − chains·len background docs each use 40
    *    globally-unique words: J = 0 against everything, so candidate
    *    volume is governed by the chains alone, NEVER by N².
    *
    * Expected survivors = background + one min-id rep per chain
    * (planted recall 1.0 ⇔ every non-rep member dropped). The harness
    * also recomputes the banded candidate count independently over the
    * chain docs plus a background slice (background contributes ~0 by
    * construction — re-signing all N docs a second time just to prove
    * a ~0 is what filled the disk on the first 20M attempt) and prints
    * it against the closed-form per-chain band math, plus per-stage
    * walls (signatures / candidates / full pipeline). */
  def fuzzy(spark: SparkSession, n: Long, chains: Int, len: Int): Unit = {
    require(len >= 41, s"len $len < 41: endpoints would share shingles")
    val nChain = chains.toLong * len
    require(nChain < n, s"chains*len $nChain must be < n $n")
    val nBg = n - nChain
    println(s"[pipescale] fuzzy n=$n chains=$chains len=$len bg=$nBg")
    val lenB = len
    val nBgB = nBg
    val gen = udf { (id: Long) =>
      val sb = new StringBuilder
      if (id < nBgB) {
        var i = 0
        while (i < 40) {
          if (i > 0) sb.append(' ')
          sb.append('b').append(id).append('_').append(i)
          i += 1
        }
      } else {
        val c = (id - nBgB) / lenB
        val j = ((id - nBgB) % lenB).toInt
        var t = j
        while (t < j + 40) {
          if (t > j) sb.append(' ')
          sb.append('c').append(c).append('_').append(t)
          t += 1
        }
      }
      sb.result()
    }
    val corpus = spark.range(n).toDF("doc_id")
      .withColumn("text", gen(col("doc_id")))
    val emptyBench = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      corpus.schema)
    val fz = graft.ops.PreparePipeline.FuzzyDedup(
      numHashes = 16, bands = 8, minJaccard = 0.4, maxIter = 30)
    val cfg = graft.ops.PreparePipeline.Config(
      stopwords = Seq("the"), minStopRatio = 0.0, minTokens = 1,
      gramN = 4, windowTokens = 2048L, packParts = 256, fuzzy = Some(fz))
    val out = timed(s"prepare+fuzzy e2e n=$n") {
      val r = graft.ops.PreparePipeline.run(corpus, emptyBench, cfg)
      r.cache().count()
      r
    }
    val inv = out.agg(
      count(lit(1)).as("rows"),
      min(col("start_token")).as("minStart"),
      max(col("start_token") + col("n_tokens")).as("maxEnd"),
      sum(col("n_tokens")).as("total")).collect()(0)
    val expected = nBg + chains
    println(s"[pipescale] rows=${inv.getLong(0)} (expected $expected) " +
      s"minStart=${inv.getLong(1)} maxEnd=${inv.getLong(2)} " +
      s"totalTokens=${inv.getLong(3)} (expected ${40L * expected})")
    // planted recall: every surviving chain id must be its chain's rep
    // (member j=0); every rep must survive
    val chainSurv = out.filter(col("doc_id") >= nBg)
    val badSurv = chainSurv.filter((col("doc_id") - nBg) % lenB =!= 0).count()
    val reps = chainSurv.count()
    val dropped = nChain - reps // members removed by the stage
    println(s"[pipescale] chain survivors=$reps (expected $chains reps), " +
      s"non-rep survivors=$badSurv, dropped=$dropped of ${nChain - chains} " +
      s"non-reps -> planted recall ${
        (nChain - chains - badSurv).toDouble / (nChain - chains)}")
    require(inv.getLong(0) == expected && badSurv == 0L && reps == chains,
      "transitive collapse broken: survivors != background + one rep/chain")
    require(inv.getLong(1) == 0L && inv.getLong(2) == inv.getLong(3) &&
      inv.getLong(3) == 40L * expected, "packing invariants broken")
    // endpoint separation: first (j=0) and last (j=len-1) member of each
    // chain must share ZERO band keys — the closure joined them, bands
    // could not have
    val endpoints = corpus.filter(col("doc_id") >= nBg &&
      ((col("doc_id") - nBg) % lenB === 0 ||
       (col("doc_id") - nBg) % lenB === lenB - 1))
    val sigs = timed("endpoint signatures") {
      val s0 = graft.ops.MinHash.signatures(endpoints, fz.numHashes).cache()
      s0.count(); s0
    }
    val rows = fz.numHashes / fz.bands
    val bandKeys = sigs.select(col("doc_id"), posexplode(
      array((0 until fz.bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*))
      .as(Seq("bi", "bk")))
    val firsts = bandKeys.filter((col("doc_id") - nBg) % lenB === 0)
      .select(((col("doc_id") - nBg) / lenB).as("c"), col("bi"), col("bk"))
    val lasts = bandKeys.filter((col("doc_id") - nBg) % lenB === lenB - 1)
      .select(((col("doc_id") - nBg) / lenB).as("c"), col("bi"), col("bk"))
    val endpointShared = firsts.join(lasts, Seq("c", "bi", "bk")).count()
    println(s"[pipescale] endpoint shared bands: $endpointShared (must be 0" +
      " — the collapse is the transitive closure, not direct candidacy)")
    require(endpointShared == 0L, "endpoints shared a band")
    sigs.unpersist()
    // candidate volume vs band math: recompute the banded candidate set
    // independently over the chain docs + a background slice and compare
    // to the per-chain closed form — candidates ∝ chains·len, never N²
    // (globally-unique background words mean background docs share no
    // shingle with anything, so the full-corpus count is the same number)
    val auditRows = corpus.filter(col("doc_id") >= nBg ||
      col("doc_id") < math.min(nBgB, 500000L))
    val allSigs = timed(s"audit-slice signatures (${fz.numHashes} hashes)") {
      val s0 = graft.ops.MinHash.signatures(auditRows, fz.numHashes).cache()
      s0.count(); s0
    }
    val allBands = allSigs.select(col("doc_id"), posexplode(
      array((0 until fz.bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*))
      .as(Seq("bi", "bk")))
    val candCount = timed("banded candidate self-join + distinct") {
      val x = allBands.select(col("bi"), col("bk"), col("doc_id").as("a"))
      val y = allBands.select(col("bi"), col("bk"), col("doc_id").as("b"))
      x.join(y, Seq("bi", "bk")).filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct().count()
    }
    // E[candidates per chain] = Σ_m (len−m)·(1 − (1 − J_m²)^bands),
    // J_m = (38−m)/(38+m) for offset-m member pairs (0 beyond m=37)
    var expCand = 0.0
    var m = 1
    while (m < lenB) {
      val jm = math.max(0.0, (38.0 - m) / (38.0 + m))
      expCand += (lenB - m) * (1.0 - math.pow(1.0 - jm * jm, fz.bands))
      m += 1
    }
    println(f"[pipescale] candidates=$candCount (closed form ≈ " +
      f"${expCand * chains}%.0f = $chains chains × $expCand%.2f; " +
      f"${candCount.toDouble / n}%.4f per doc — volume rides the chains, " +
      "not N^2)")
    require(candCount < 4.0 * expCand * chains + 1000,
      "candidate volume far above the band math")
    allSigs.unpersist()
    out.unpersist()
  }

  def decontam(spark: SparkSession, n: Long, b: Int): Unit = {
    println(s"[pipescale] decontam n=$n bench=$b")
    // ~40-word documents from a 1000-word vocabulary; benchmark docs are
    // drawn from the same generator (ids n..n+b), so some 4-gram overlap
    // occurs naturally at matching PRNG states
    val gen = udf { (id: Long) =>
      val r = new scala.util.Random(id * 1099511628211L + 7)
      Array.fill(40)("w" + r.nextInt(1000)).mkString(" ")
    }
    val train = spark.range(n).toDF("doc_id")
      .withColumn("text", gen(col("doc_id")))
    val bench = spark.range(n, n + b).toDF("doc_id")
      .withColumn("text", gen(col("doc_id") % 4096L)) // replayed states ⇒ planted overlap
    val res = timed(s"flagContaminated n=$n b=$b") {
      val r = graft.ops.Decontaminate.flagContaminated(train, bench)
      r.cache().count()
      r
    }
    val hit = res.filter(col("contaminated")).count()
    println(s"[pipescale] contaminated: $hit of $n")
    require(hit > 0, "planted overlap not detected")
    val plan = res.queryExecution.executedPlan.toString
    require(plan.contains("BroadcastHashJoin"), "bench grams not broadcast")
    println("[pipescale] plan: broadcast confirmed")
    // the petabyte-scale key variant: same corpus, xxhash64 gram keys —
    // must flag the IDENTICAL doc set with the same broadcast plan
    val resH = timed(s"flagContaminated hashGrams n=$n b=$b") {
      val r = graft.ops.Decontaminate
        .flagContaminated(train, bench, hashGrams = true)
      r.cache().count()
      r
    }
    val planH = resH.queryExecution.executedPlan.toString
    require(planH.contains("BroadcastHashJoin"), "hashed grams not broadcast")
    require(planH.contains("xxhash64"), "hash key projection missing")
    val diff = res.join(resH, Seq("doc_id"))
      .filter(res("contaminated") =!= resH("contaminated")).count()
    require(diff == 0, s"hashed flags diverge on $diff docs")
    println(s"[pipescale] hashGrams: flags identical on all $n docs, " +
      "broadcast+xxhash64 plan confirmed")
    res.unpersist(); resH.unpersist()
  }
}
