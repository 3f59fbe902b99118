package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Coreness, DagLevels, HopDistance, Scc}

/** Algorithm-equivalence properties for the round-12 graph operators:
  * the distributed formulations must agree with direct reference
  * implementations (plain-Scala peel / BFS) on random graphs — the
  * strongest check available when no closed form exists.
  */
class GraphPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, tests: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  /** Reference core numbers by the textbook sequential min-degree
    * peel: repeatedly remove a minimum-degree node; its core number is
    * the max over (its degree at removal, previous max). */
  private def peelCoreness(edges: Set[(Long, Long)]): Map[Long, Long] = {
    var adj = edges.flatMap(e => Seq(e, (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var core = Map.empty[Long, Long]
    var kMax = 0L
    while (adj.nonEmpty) {
      val (node, nbrs) = adj.minBy { case (n, s) => (s.size, n) }
      kMax = math.max(kMax, nbrs.size.toLong)
      core += node -> kMax
      adj -= node
      adj = adj.map { case (k, v) => k -> (v - node) }
    }
    core
  }

  /** Reference multi-source BFS distances. */
  private def bfsRef(edges: Set[(Long, Long)], seeds: Set[Long])
      : Map[Long, Option[Long]] = {
    val adj = edges.flatMap(e => Seq(e, (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keySet
    var dist = nodes.filter(seeds).map(_ -> 0L).toMap
    var frontier = dist.keySet
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    nodes.map(n => n -> dist.get(n)).toMap
  }

  private val edgesGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(4, 14)
    m <- Gen.choose(3, 24)
    es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong),
      Gen.choose(0L, n.toLong)))
  } yield es.filter(e => e._1 != e._2)
    .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  test("property: H-index coreness == sequential min-degree peel") {
    check(Prop.forAll(edgesGen.suchThat(_.nonEmpty)) { es =>
      val df = es.toSeq.toDF("src", "dst")
      val sym = df.unionByName(
        df.select($"dst".as("src"), $"src".as("dst")))
      val got = Coreness.run(sym, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == peelCoreness(es)
    })
  }

  test("property: distributed BFS == reference shortest hops") {
    check(Prop.forAll(edgesGen.suchThat(_.nonEmpty)) { es =>
      val nodes = es.flatMap(e => Seq(e._1, e._2))
      val seeds = nodes.toSeq.sorted.take(2).toSet
      val df = es.toSeq.toDF("src", "dst")
      val sym = df.unionByName(
        df.select($"dst".as("src"), $"src".as("dst")))
      val got = HopDistance.run(sym, "src", "dst",
          seeds.toSeq.toDF("sid"), "sid")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      got == bfsRef(es, seeds)
    })
  }

  /** Reference SCC labels (min member id) by brute-force transitive
    * closure over directed edges. */
  private def sccRef(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var reach = nodes.map(n => n -> Set(n)).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((u, v) <- edges) {
        val merged = reach(u) ++ reach(v)
        if (merged.size != reach(u).size) { reach += u -> merged; changed = true }
      }
    }
    nodes.map { n =>
      val comp = reach(n).filter(m => reach(m).contains(n))
      n -> comp.min
    }.toMap
  }

  /** Reference longest-path levels on a DAG. */
  private def levelsRef(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var lvl = nodes.map(_ -> 0L).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((u, v) <- edges) {
        if (lvl(u) + 1 > lvl(v)) { lvl += v -> (lvl(u) + 1); changed = true }
      }
    }
    lvl
  }

  // directed: no symmetrization, self-loops filtered, both directions
  // possible independently
  private val directedGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(4, 12)
    m <- Gen.choose(3, 22)
    es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong),
      Gen.choose(0L, n.toLong)))
  } yield es.filter(e => e._1 != e._2).toSet

  test("property: FW-BW peeling SCC == brute-force mutual reachability") {
    check(Prop.forAll(directedGen.suchThat(_.nonEmpty)) { es =>
      val got = Scc.run(es.toSeq.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == sccRef(es)
    }, tests = 8)
  }

  test("property: incremental SCC == batch SCC on the union") {
    val g = directedGen.suchThat(_.size >= 4).map { es =>
      val sorted = es.toSeq.sortBy(identity)
      val cut = math.max(1, sorted.size * 3 / 4)
      (sorted.take(cut).toSet, sorted.drop(cut).toSet)
    }
    check(Prop.forAll(g.suchThat(_._2.nonEmpty)) {
      case (corpus, delta) =>
        val standing = Scc.run(corpus.toSeq.toDF("src", "dst"),
          "src", "dst")
        val condE = Scc.condensationEdges(
          corpus.toSeq.toDF("src", "dst"), standing, "src", "dst")
        val (labels, _) = Scc.incremental(standing, condE,
          delta.toSeq.toDF("src", "dst"), "src", "dst")
        val got = labels.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == sccRef(corpus ++ delta)
    }, tests = 6)
  }

  test("property: DAG levels == reference longest path (cycle-free " +
      "inputs via DAG-ification)") {
    // orient every edge low -> high: guaranteed acyclic
    check(Prop.forAll(edgesGen.suchThat(_.nonEmpty)) { es =>
      val got = DagLevels.run(es.toSeq.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == levelsRef(es)
    }, tests = 8)
  }

  test("property: incremental BFS == from-scratch BFS on the union") {
    val g = for {
      es <- edgesGen.suchThat(_.size >= 4)
    } yield {
      val sorted = es.toSeq.sortBy(identity)
      val cut = math.max(1, sorted.size * 3 / 4)
      (sorted.take(cut).toSet, sorted.drop(cut).toSet)
    }
    check(Prop.forAll(g.suchThat(_._2.nonEmpty)) {
      case (corpus, delta) =>
        val nodes = corpus.flatMap(e => Seq(e._1, e._2))
        if (nodes.isEmpty) true
        else {
          val seeds = nodes.toSeq.sorted.take(1).toSet
          def sym(es: Set[(Long, Long)]) = {
            val df = es.toSeq.toDF("src", "dst")
            df.unionByName(df.select($"dst".as("src"), $"src".as("dst")))
          }
          val standing = HopDistance.run(sym(corpus), "src", "dst",
            seeds.toSeq.toDF("sid"), "sid")
          val inc = HopDistance.incremental(standing,
              sym(corpus ++ delta), sym(delta), "src", "dst")
            .collect().map(r => r.getLong(0) ->
              (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
          inc == bfsRef(corpus ++ delta, seeds)
        }
    }, tests = 8)
  }
}
