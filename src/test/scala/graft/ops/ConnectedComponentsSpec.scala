package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Star-edge connected components: connectivity equivalence to the clique
  * form, linear edge counts, and bounded convergence rounds. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("star edges have clique connectivity at linear edge count") {
    // one 5-member group, one 3-member group, singletons (no edges)
    val members = Seq(
      (10L, "a"), (11L, "a"), (12L, "a"), (13L, "a"), (14L, "a"),
      (20L, "b"), (21L, "b"), (22L, "b"),
      (30L, "c"), (40L, null.asInstanceOf[String])).toDF("id", "k")
    val edges = ConnectedComponents.starEdges(members, "id", "k").collect()
    // 2(k-1) per group: 8 for the 5-group, 4 for the 3-group
    assert(edges.length === 12)
    val (labels, _) = ConnectedComponents.run(members, ConnectedComponents.starEdges(members, "id", "k"), "id")
    val byId = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(byId(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(byId(_) == 20L))
    assert(byId(30L) === 30L)
    assert(byId(40L) === 40L)
  }

  test("cross-key bridges merge into one component (transitive closure)") {
    // key1 groups {1,2} {3,4} {5,6}; key2 bridges {2,3} {4,5}:
    // everything is one component rooted at 1 — needs multi-hop label flow
    val members = Seq(
      (1L, "x", "p"), (2L, "x", "q"), (3L, "y", "q"),
      (4L, "y", "r"), (5L, "z", "r"), (6L, "z", "s")).toDF("id", "k1", "k2")
    val edges = ConnectedComponents.starEdges(members, "id", "k1")
      .union(ConnectedComponents.starEdges(members, "id", "k2"))
    val (labels, rounds) = ConnectedComponents.run(members, edges, "id")
    assert(labels.collect().forall(_.getLong(1) == 1L))
    // pointer halving collapses the 6-chain fast; and the fixpoint probe
    // costs exactly one extra confirming round
    assert(rounds <= 4, s"took $rounds rounds")
  }

  test("random key-group graphs match a driver-side union-find oracle") {
    // the operator's input shape: nodes tagged with two blocking keys;
    // ground truth = union-find over the full cliques those keys imply
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 60 + trial * 40
      val rows = (0 until n).map { id =>
        (id.toLong, s"k1-${rnd.nextInt(12)}", s"k2-${rnd.nextInt(18)}")
      }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      def unite(a: Int, b: Int): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      Seq(1, 2).foreach { ki =>
        rows.groupBy(r => if (ki == 1) r._2 else r._3).values.foreach { g =>
          g.sliding(2).foreach { case Seq(a, b) => unite(a._1.toInt, b._1.toInt); case _ => () }
        }
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val members = rows.toDF("id", "k1", "k2")
      val edges = ConnectedComponents.starEdges(members, "id", "k1")
        .union(ConnectedComponents.starEdges(members, "id", "k2"))
      val (labels, rounds) = ConnectedComponents.run(members, edges, "id")
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial (n=$n, rounds=$rounds)")
    }
  }

  test("large/small-star alternation agrees with label propagation and union-find") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 50 + trial * 50
      // random sparse edges, including some self-contained clusters
      val raw = (0 until (n * 3 / 2)).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val nodes = (0 until n).map(_.toLong).toDF("id")
      val edges = raw.toDF("src", "dst")
      val (alt, altRounds) =
        ConnectedComponents.alternatingComponents(nodes, edges, "id")
      val gotAlt = alt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotAlt === expected, s"trial $trial alternation (rounds=$altRounds)")
      val symmetric = edges.unionAll(edges.toDF("dst", "src").select(col("src"), col("dst")))
      val (lab, _) = ConnectedComponents.run(nodes, symmetric, "id")
      val gotLab = lab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLab === expected, s"trial $trial label-prop")
    }
  }

  test("alternation collapses a deep chain in logarithmic rounds") {
    // a 256-node path — the depth shape where per-key stars do not exist
    // and plain neighbor propagation would need ~n rounds without halving
    val n = 256
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents.alternatingComponents(nodes, edges, "id")
    assert(labels.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 12, s"took $rounds rounds for a ${n}-chain")
  }

  test("superseded per-round checkpoints are released eagerly (both loops)") {
    // PLANS "cutLineage loop-site classification": loop-carried sites must
    // not accumulate one block set per round — each round's checkpoint
    // releases its predecessor as soon as the replacement materializes.
    // Pin it via the context's persistent-RDD registry: after a multi-round
    // run, the only NEW persisted RDD is the FINAL round's checkpoint (the
    // returned frame still references it); every superseded round's blocks
    // and the loop-invariant edge persist are gone. Without the eager
    // release this diff grows linearly with rounds.
    val sc = spark.sparkContext
    def persisted: Set[Int] = sc.getPersistentRDDs.keySet.toSet

    val members = Seq(
      (1L, "x", "p"), (2L, "x", "q"), (3L, "y", "q"),
      (4L, "y", "r"), (5L, "z", "r"), (6L, "z", "s")).toDF("id", "k1", "k2")
    val edges = ConnectedComponents.starEdges(members, "id", "k1")
      .union(ConnectedComponents.starEdges(members, "id", "k2"))
    val base1 = persisted
    val (labels, rounds) = ConnectedComponents.run(members, edges, "id")
    assert(rounds >= 2, s"need a multi-round run to exercise the release (got $rounds)")
    val extra1 = persisted -- base1
    assert(extra1.size <= 1,
      s"run() left ${extra1.size} new persisted RDDs after $rounds rounds — superseded checkpoints not released")
    assert(labels.count() === 6L) // the survivor is still readable

    val n = 64
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val base2 = persisted
    val (labelsAlt, altRounds) = ConnectedComponents.alternatingComponents(nodes, chain, "id")
    assert(altRounds >= 2)
    val extra2 = persisted -- base2
    assert(extra2.size <= 1,
      s"alternatingComponents left ${extra2.size} new persisted RDDs after $altRounds rounds")
    assert(labelsAlt.count() === n.toLong)
  }

  test("dd_conn_components converges in <= 3 rounds at sf0.001") {
    // the real query shape: star edges on norm_key + winnow_fp over the
    // documents table — duplicate groups are shallow stars, so the loop
    // must converge in 2 propagation rounds + 1 confirming round
    val err = new java.io.ByteArrayOutputStream()
    val df = Console.withErr(err) {
      graft.queries.Catalog.byName("dd_conn_components").build(spark, sfSmoke)
    }
    assert(df.count() === 500)
    val m = "converged in (\\d+) rounds".r.findFirstMatchIn(err.toString)
    assert(m.exists(_.group(1).toInt <= 3), s"stderr: ${err.toString.trim}")
  }
}
