package graft.tools_dev

/** Driver-side microbench for the BinaryHash signature kernels — the
  * per-row cost that dominates LSH near-dup encode at corpus scale
  * (at sf0.1 the v15 row is fixed-stage-bound, so the kernel's win is
  * only measurable in isolation or at rehearsal scale).
  *
  * Usage: sbt "runMain graft.tools_dev.SigBench [nRows] [d] [reps]"
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(200000)
    val d = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val rnd = new scala.util.Random(7)
    val vecs = Array.fill(n)(Array.fill(d)(rnd.nextGaussian().toFloat))
    val m = graft.index.BinaryHash.train(d = d, nbits = 63, seed = 7L)
    val w = graft.index.BinaryHash.trainWide(d = d, nbits = 128, seed = 7L)
    var sink = 0L
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { sink ^= m.signature(vecs(i)); i += 1 }
      val t1 = System.nanoTime()
      var j = 0
      while (j < n) { sink ^= w.signature(vecs(j))(0); j += 1 }
      val t2 = System.nanoTime()
      println(f"[sigbench] rep $r: narrow63 ${(t1 - t0) / 1e6}%.0f ms, " +
        f"wide128 ${(t2 - t1) / 1e6}%.0f ms  ($n rows x d=$d)")
    }
    println(s"[sigbench] sink=$sink")
  }
}
