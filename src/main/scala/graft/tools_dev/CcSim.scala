package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev tool: pull the real d08/d13 candidate graphs and simulate CC
  * algorithm variants in-driver to compare ROUND counts before
  * committing to a distributed shape (each distributed round is a
  * fixed job-overhead floor at sf scale). */
object CcSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("chain")) {
      import spark.implicits._
      val chain = (0L until 12L).map(i => (i, i + 1))
      simulate("chain12", chain.toArray)
      val res = graft.ops.Components.connectedComponents(chain.toDF("a", "b"))
      println(s"chain12 distributed rounds=${res.rounds} converged=${res.converged}")
      val r1 = graft.ops.Components.connectedComponents(chain.toDF("a", "b"), maxIter = 1)
      println("after round0: " + r1.labels.collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}").sorted.mkString(" "))
      val r2 = graft.ops.Components.connectedComponents(chain.toDF("a", "b"), maxIter = 2)
      println("after round1: " + r2.labels.collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}").sorted.mkString(" "))
      spark.stop(); return
    }
    val cand = graft.queries.Documents.queries("d03_lsh_candidates")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"edges=${cand.length}")
    simulate("d08", cand)
    spark.stop()
  }

  def simulate(name: String, edges: Array[(Long, Long)]): Unit = {
    val nbrs = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, new scala.collection.mutable.ArrayBuffer()) += b
      nbrs.getOrElseUpdate(b, new scala.collection.mutable.ArrayBuffer()) += a
    }
    val nodes = nbrs.keys.toArray.sorted

    // 1. plain min-label propagation (the r16 shape)
    {
      var comp = nodes.map(n => n -> n).toMap
      var rounds = 0; var changed = true
      while (changed) {
        changed = false; rounds += 1
        val next = nodes.map { u =>
          val m = (Seq(comp(u)) ++ nbrs(u).map(comp)).min
          if (m < comp(u)) changed = true
          u -> m
        }.toMap
        comp = next
      }
      println(s"$name plain-propagation rounds=$rounds")
    }

    // 2. propagation + k pointer jumps
    for (k <- 1 to 3) {
      var comp = nodes.map(n => n -> n).toMap
      var rounds = 0; var changed = true
      while (changed) {
        changed = false; rounds += 1
        var next = nodes.map { u =>
          u -> (Seq(comp(u)) ++ nbrs(u).map(comp)).min
        }.toMap
        for (_ <- 1 to k)
          next = nodes.map { u => u -> math.min(next(u), next(next(u))) }.toMap
        if (nodes.exists(u => next(u) < comp(u))) changed = true
        comp = next
      }
      println(s"$name propagation+jump$k rounds=$rounds")
    }

    // 2b. propagation + jump through the PREVIOUS round's labels (the
    //     distributed-cheap variant: the jump target is already
    //     materialized, so no plan blowup and no extra action)
    {
      var comp = nodes.map(n => n -> n).toMap
      var rounds = 0; var changed = true
      while (changed) {
        rounds += 1
        var next = nodes.map { u =>
          u -> (Seq(comp(u)) ++ nbrs(u).map(comp)).min
        }.toMap
        if (rounds == 1) next = nodes.map { u => u -> math.min(next(u), next(next(u))) }.toMap
        else next = nodes.map { u => u -> math.min(next(u), comp(next(u))) }.toMap
        changed = nodes.exists(u => next(u) < comp(u))
        comp = next
      }
      println(s"$name propagation+prevjump rounds=$rounds")
    }

    // 3. min-star contraction levels (each level: m(u)=min(N(u)+{u}),
    //    contract edges through m, recurse; unwind is one lazy join chain)
    {
      var es = edges.toSet
      var levels = 0
      while (es.nonEmpty) {
        levels += 1
        val nb = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        es.foreach { case (a, b) =>
          nb.getOrElseUpdate(a, new scala.collection.mutable.ArrayBuffer()) += b
          nb.getOrElseUpdate(b, new scala.collection.mutable.ArrayBuffer()) += a
        }
        val m = nb.keys.map(u => u -> (nb(u) :+ u).min).toMap
        es = es.flatMap { case (a, b) =>
          val (x, y) = (m(a), m(b))
          if (x == y) None else Some((math.min(x, y), math.max(x, y)))
        }
      }
      println(s"$name contraction levels=$levels (unwind joins=$levels)")
    }

    // 4. large-star / small-star (Kiveris et al.)
    {
      var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      var rounds = 0; var changed = true
      while (changed) {
        rounds += 1
        // large-star
        val nb = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        es.foreach { case (a, b) =>
          nb.getOrElseUpdate(a, new scala.collection.mutable.ArrayBuffer()) += b
          nb.getOrElseUpdate(b, new scala.collection.mutable.ArrayBuffer()) += a
        }
        val ls = nb.keys.flatMap { u =>
          val m = (nb(u) :+ u).min
          nb(u).filter(_ > u).map(v => (math.min(v, m), math.max(v, m)))
        }.filter(e => e._1 != e._2).toSet
        // small-star
        val nb2 = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        ls.foreach { case (a, b) => // a < b: b -> a edge (parent pointers)
          nb2.getOrElseUpdate(b, new scala.collection.mutable.ArrayBuffer()) += a
        }
        val ss = nb2.keys.flatMap { u =>
          val s = nb2(u)
          val m = (s :+ u).min
          (s :+ u).filter(v => v != m).map(v => (math.min(v, m), math.max(v, m)))
        }.filter(e => e._1 != e._2).toSet
        changed = ss != es
        es = ss
      }
      println(s"$name large/small-star rounds=$rounds (x2 passes each)")
    }
  }
}
