package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** PageRank properties: exact parity with a driver-side reference
  * implementation of the same integer recurrence (any graph), bit parity
  * between the fixed-K and convergence paths, mass conservation, hub
  * dominance, and contraction-bounded round counts.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence — the oracle for
    * the distributed path on arbitrary graphs. */
  private def refPageRank(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val outdeg = sym.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val n = outdeg.size.toLong
    val teleport = GraphOps.Scale * (GraphOps.DampDen - GraphOps.DampNum) /
      GraphOps.DampDen / n
    var pr = outdeg.map { case (k, _) => k -> (GraphOps.Scale / n) }
    for (_ <- 1 to iters) {
      val s = scala.collection.mutable.LongMap.empty[Long]
      sym.foreach { case (u, v) =>
        s(v) = s.getOrElse(v, 0L) + pr(u) / outdeg(u)
      }
      pr = outdeg.map { case (k, _) =>
        k -> (teleport + GraphOps.DampNum * s.getOrElse(k, 0L) / GraphOps.DampDen)
      }
    }
    pr
  }

  /** A deterministic irregular graph: ring + skip links + one hub. */
  private def testPairs: Seq[(Long, Long)] = {
    val ring = (0L until 60L).map(i => i -> ((i + 1) % 60))
    val skips = (0L until 60L by 3).map(i => i -> ((i * 7 + 13) % 60)).filter { case (a, b) => a != b }
    val hub = (1L until 60L by 2).map(i => 60L -> i)
    (ring ++ skips ++ hub).map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.filter { case (a, b) => a != b }
  }

  private def prOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank matches the driver-side integer recurrence exactly") {
    val pairs = testPairs.toDF("d1", "d2")
    for (k <- Seq(1, 3, 5)) {
      val dist = prOf(GraphOps.pageRank(pairs, k))
      val ref = refPageRank(testPairs, k)
      assert(dist == ref, s"iter=$k: distributed != reference")
    }
  }

  test("pageRankConverged is bit-identical to pageRank at the same round count") {
    val pairs = testPairs.toDF("d1", "d2")
    // tol = -1 forces exactly maxRounds rounds (delta is never negative)
    val conv = prOf(GraphOps.pageRankConverged(pairs, tolMicro = -1L, maxRounds = 4))
    assert(GraphOps.lastPrRounds.get == 4)
    assert(conv == prOf(GraphOps.pageRank(pairs, 4)))
  }

  test("mass conservation: total rank stays within bounded floor loss") {
    val pairs = testPairs.toDF("d1", "d2")
    val nNodes = 61L
    val nDirected = 2L * testPairs.size
    for (k <- Seq(1, 4)) {
      val mass = GraphOps.pageRank(pairs, k).agg(sum("pr")).head.getLong(0)
      assert(mass <= GraphOps.Scale)
      // each round floors once per directed edge, once per node (damping),
      // plus the initial Scale/n and teleport floors lose < n each
      val bound = k * (nDirected + nNodes) + 2 * nNodes
      assert(mass >= GraphOps.Scale - bound,
        s"iter=$k: mass $mass lost more than $bound micro-units")
    }
  }

  test("hub dominance: star center outranks leaves, leaves tie") {
    val star = (1L to 40L).map(i => 0L -> i).toDF("d1", "d2")
    val pr = prOf(GraphOps.pageRank(star, 5))
    val leaves = (1L to 40L).map(pr)
    assert(pr(0L) > leaves.max, "hub must outrank every leaf")
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
  }

  test("contraction: rounds to tolerance follow the d^k law on an irregular graph") {
    val pairs = testPairs.toDF("d1", "d2")
    // L1 movement contracts by ≈ d = 0.85 per round: a 0.1%-of-mass
    // tolerance must be reached in ≈ 1 + ln(Δ₁/1e9)/ln(1/0.85) ≲ 40
    // rounds, and a 10× looser tolerance in ~14 fewer rounds.
    val tol = GraphOps.Scale / 1000L
    val fix = prOf(GraphOps.pageRankConverged(pairs, tolMicro = tol))
    val rounds = GraphOps.lastPrRounds.get
    assert(rounds > 2 && rounds < 45, s"took $rounds rounds")
    GraphOps.pageRankConverged(pairs, tolMicro = 10L * tol)
    val fewer = GraphOps.lastPrRounds.get
    assert(fewer < rounds, s"looser tolerance took $fewer >= $rounds rounds")
    // the stop point is a genuine tol-neighborhood of the fixpoint:
    // one more fixed round moves at most tol mass
    val more = prOf(GraphOps.pageRank(pairs, rounds + 1))
    val drift = fix.keys.map(k => math.abs(fix(k) - more(k))).sum
    assert(drift <= tol, s"fixpoint drift $drift > $tol")
  }

  test("clique graphs converge in a few rounds even at tight tolerance") {
    // a union of cliques: the uniform start is the per-component
    // fixpoint shape, so Δ collapses to floor noise immediately — this
    // is the regime real near-dup graphs live in and why the query key
    // can afford tolMicro = 1000
    val cliques = for {
      (base, size) <- Seq((0L, 4), (100L, 7), (200L, 3), (300L, 12))
      i <- 0 until size; j <- (i + 1) until size
    } yield (base + i, base + j)
    GraphOps.pageRankConverged(cliques.toDF("d1", "d2"), tolMicro = 1000L)
    val rounds = GraphOps.lastPrRounds.get
    assert(rounds <= 4, s"clique graph took $rounds rounds")
  }

  test("dedup_cluster_stats reconciles: sum(size * n_clusters) = corpus docs") {
    val stats = SparkEntry.queries("dedup_cluster_stats")(spark, sfDir).collect()
    val total = stats.map(r => r.getLong(0) * r.getLong(1)).sum
    val docs = Tables.t(spark, sfDir, "documents").count()
    assert(total == docs, s"histogram mass $total != $docs docs")
    // CC labels only contain edge-connected nodes, so every non-singleton
    // bucket has size >= 2 and the singleton bucket exists
    assert(stats.filter(_.getLong(0) > 1).forall(_.getLong(1) > 0))
  }

  test("triangles matches brute-force enumeration on an irregular graph") {
    // testPairs alone is triangle-free (the hub only touches odd nodes and
    // ring edges always pair odd with even) — add (i, i+2) chords so ring
    // triangles exist, including on the hub's odd neighbors.
    val pairs = (testPairs ++ (0L until 20L by 2).map(i => i -> (i + 2)) ++
      Seq(3L -> 5L, 7L -> 9L)).distinct
    // Driver-side reference: every id-sorted triple whose three edges all
    // exist in the normalized pair set.
    val edges = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val ref = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if edges((a, b)) && edges((b, c)) && edges((a, c))
    } yield (a, b, c)
    val got = GraphOps.triangles(pairs.toDF("d1", "d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ref.nonEmpty, "test graph should contain triangles")
    assert(got == ref.toSet, s"${got.size} triangles vs reference ${ref.size}")
  }

  test("triangles: K4 has exactly 4, a star has none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val gotK4 = GraphOps.triangles(k4.toDF("d1", "d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotK4 == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val star = (2L to 20L).map(i => (1L, i))
    assert(GraphOps.triangles(star.toDF("d1", "d2")).count() == 0)
  }

  test("clusteringCoeff matches brute force on an irregular graph") {
    val pairs = (testPairs ++ (0L until 20L by 2).map(i => i -> (i + 2)) ++
      Seq(3L -> 5L, 7L -> 9L)).distinct
    val edges = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
    val ref = adj.collect { case (v, ns) if ns.size >= 2 =>
      val nbrs = ns.toSeq.sorted
      val closed = (for {
        i <- nbrs.indices; j <- (i + 1) until nbrs.size
        if edges((math.min(nbrs(i), nbrs(j)), math.max(nbrs(i), nbrs(j))))
      } yield 1).size.toLong
      v -> ((ns.size.toLong, closed,
        BigDecimal(closed * 2.0 / (ns.size.toLong * (ns.size - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = GraphOps.clusteringCoeff(pairs.toDF("d1", "d2")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(ref.values.exists(_._2 > 0), "test graph should close some wedges")
    assert(got == ref, s"coeff mismatch: got ${got.size} rows vs ${ref.size}")
  }

  test("clusteringCoeff: clique nodes are 1, star center and leaves are 0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val star = (11L to 15L).map(i => (10L, i))
    val got = GraphOps.clusteringCoeff((k4 ++ star).toDF("d1", "d2")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert((1L to 4L).forall(got(_) == 1.0))
    assert(got(10L) == 0.0)
    assert(!(11L to 15L).exists(got.contains), "degree-1 leaves are excluded")
  }

  test("clusterCohesion separates a clique from a chain") {
    // K4 on {1..4} (a true duplicate set) ∪ a 3-path on {10,11,12}
    // (a chained false merge): the report must show the clique as
    // triangle-rich and the chain as triangle-free.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L))
    val rows = GraphOps.clusterCohesion(g.toDF("d1", "d2")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(1L -> ((4L, 6L, 4L)), 10L -> ((3L, 2L, 0L))))
  }

  test("degreeDist conserves node and edge mass") {
    val pairs = testPairs.toDF("d1", "d2")
    val dist = GraphOps.degreeDist(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nNodes = testPairs.flatMap { case (a, b) => Seq(a, b) }.distinct.size
    assert(dist.map(_._2).sum == nNodes)
    // Σ degree·count = 2·|edges| (handshake lemma)
    assert(dist.map { case (d, c) => d * c }.sum == 2L * testPairs.size)
  }

  test("kCore: cliques survive intact, paths and tails peel away") {
    // K4: every node has degree 3 ≥ 2 — the 2-core is the whole clique.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val coreK4 = GraphOps.kCore(k4.toDF("d1", "d2"), k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(coreK4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // A path has no 2-core: endpoints peel first, then the next, inward.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(GraphOps.kCore(path.toDF("d1", "d2"), 2, 4).count() == 0)
    // Triangle + pendant tail: the triangle survives with degree 2 each,
    // the tail peels.
    val ringTail = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 6L), (6L, 7L))
    val rt = GraphOps.kCore(ringTail.toDF("d1", "d2"), 2, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rt == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore reaches its fixpoint within the oracle's peel budget on testdata") {
    val pairs = operators.DedupOps
      .jaccardPairs(Tables.t(spark, sfDir, "documents"), tau = 0.6)
      .select("d1", "d2").localCheckpoint()
    def setOf(rounds: Int) = GraphOps.kCore(pairs, 2, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r4 = setOf(4)
    assert(r4 == setOf(5), "graph_kcore oracle unrolls 4 peels; fixpoint not reached")
    assert(r4.forall(_._2 >= 2), "2-core members must keep residual degree >= 2")
  }

  test("commonNeighbors: wedge endpoints scored, known edges and hubs excluded") {
    // Star 0–{1,2,3}: each leaf pair shares exactly one neighbor.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("d1", "d2")
    assert(GraphOps.commonNeighbors(star, minShared = 2).count() == 0)
    val cn1 = GraphOps.commonNeighbors(star, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cn1 == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // 4-cycle: both diagonals share two neighbors.
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("d1", "d2")
    val diag = GraphOps.commonNeighbors(sq, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(diag == Set((1L, 3L, 2L), (2L, 4L, 2L)))
    // K3: every wedge closes into a known edge — nothing to predict.
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("d1", "d2")
    assert(GraphOps.commonNeighbors(k3, 1).count() == 0)
    // A hub past WedgeCenterCap mines no wedges: star with 60 leaves.
    val bigStar = (1L to 60L).map(i => (0L, i)).toDF("d1", "d2")
    assert(GraphOps.commonNeighbors(bigStar, 1).count() == 0)
  }

  /** Driver-side replay of the synchronous plurality/min-label LPA
    * recurrence — the oracle for [[GraphOps.labelPropagation]] on
    * arbitrary graphs. */
  private def refLpa(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = sym.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    var lbl: Map[Long, Long] = nbrs.keys.map(k => k -> k).toMap
    for (_ <- 1 to rounds) {
      val prev = lbl
      lbl = nbrs.map { case (v, ns) =>
        val cnt = ns.groupBy(prev).map { case (l, xs) => l -> xs.size }
        v -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  test("labelPropagation matches the driver-side synchronous replay") {
    val pairs = testPairs.toDF("d1", "d2")
    for (k <- Seq(1, 4)) {
      val got = GraphOps.labelPropagation(pairs, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refLpa(testPairs, k), s"rounds=$k")
    }
    // two disjoint triangles converge to two communities labeled by
    // their smallest members
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("d1", "d2")
    val comm = GraphOps.labelPropagation(tri, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comm.filterKeys(_ < 10L).values.toSet.size == 1)
    assert(comm.filterKeys(_ >= 10L).values.toSet.size == 1)
  }

  test("adamicAdar: 1/ln(deg) snap-and-accumulate scored on a synthetic fixture") {
    // Non-vacuous exercise of the weighted path (graph_adamic_adar's
    // cross-engine row at test sf is 0 rows, so the arithmetic is only
    // compared here). Edges: 1–3, 2–3, 1–4, 2–4, 4–5.
    //   deg(3) = 2, deg(4) = 3.
    //   (1,2): shares centers 3 and 4 → aa = r4(1/ln2) + r4(1/ln3)
    //   (3,4): shares centers 1 and 2 (both deg 2) → aa = 2·r4(1/ln2)
    // with r4 = HALF_UP round to the 1e-4 lattice (the lmDocScores
    // ln-snap rule), i.e. r4(1/ln2) = 1.4427, r4(1/ln3) = 0.9102.
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    val got = GraphOps.adamicAdar(edges, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((1L, 2L, 2L, 2.3529), (3L, 4L, 2L, 2.8854)),
      s"adamicAdar fixture mismatch: $got")
    // At minShared = 1 the single-neighbor pairs (1,5), (2,5) join in.
    assert(GraphOps.adamicAdar(edges, minShared = 1).count() == 4)
  }

  test("nodeJaccard: lattice overlap scored on the adamicAdar fixture") {
    // Same fixture graph (corpus rows are 0 at test sf, so the degree
    // attach + lattice division is only compared here).
    //   deg: 1→2, 2→2, 3→2, 4→3, 5→1.
    //   (1,2): common {3,4} = 2, union = 2+2−2 = 2 → 1_000_000
    //   (3,4): common {1,2} = 2, union = 2+3−2 = 3 → 666_666 (trunc)
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    val got = GraphOps.nodeJaccard(edges, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set((1L, 2L, 2L, 2L, 2L, 1000000L),
      (3L, 4L, 2L, 2L, 3L, 666666L)), s"nodeJaccard fixture mismatch: $got")
    // minShared = 1 admits (1,5) and (2,5) through center 4:
    // common 1, union 2+1−1 = 2 → 500_000.
    val loose = GraphOps.nodeJaccard(edges, minShared = 1).collect()
    assert(loose.length == 4)
    assert(loose.count(_.getLong(5) == 500000L) == 2)
  }

  test("hits: two-round integer hub/authority replay on a fixture") {
    // Directed d1→d2 edges (1→3),(2→3),(1→4),(2→4),(4→5); h⁰ = 1.
    //   a¹ = indegree: a¹(3)=a¹(4)=2, a¹(5)=1.
    //   h¹(1)=h¹(2)=a¹(3)+a¹(4)=4, h¹(4)=a¹(5)=1.
    //   a²(3)=a²(4)=h¹(1)+h¹(2)=8, a²(5)=h¹(4)=1.
    //   h²(1)=h²(2)=16, h²(4)=1; pure sinks hub 0, pure sources auth 0.
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    val got = GraphOps.hits(edges, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 16L, 0L), (2L, 16L, 0L), (3L, 0L, 8L),
      (4L, 1L, 8L), (5L, 0L, 1L)), s"hits fixture mismatch: $got")
  }

  test("graph_pagerank query runs on sf0.001 with full mass") {
    val out = SparkEntry.queries("graph_pagerank")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // sorted by rank desc then id
    val prs = rows.map(_.getLong(1))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    val mass = prs.sum
    assert(mass <= GraphOps.Scale && mass >= GraphOps.Scale * 99 / 100)
  }
}
