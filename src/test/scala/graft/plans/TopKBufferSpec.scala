package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property check of the bounded heap behind the top-k
  * aggregate: against a sort-based reference over randomized inputs
  * (duplicates, ties, adversarial orders), plus serialization round-trip
  * through the aggregate's byte format. Seeded, so failures reproduce. */
class TopKBufferSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }.take(k)

  private def viaBuffer(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] = {
    val b = new TopKBuffer(k)
    xs.foreach { case (s, i) => b.offer(s, i) }
    val (ss, ii) = b.sortedBestFirst
    ss.zip(ii).toSeq
  }

  test("matches the sort-based reference over 300 randomized trials") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { trial =>
      val n = rnd.nextInt(50)
      val k = 1 + rnd.nextInt(8)
      // small value domain -> dense score ties; small id domain -> dup pairs
      val xs = Seq.fill(n)((rnd.nextInt(6).toDouble / 2, rnd.nextInt(20).toLong))
      assert(viaBuffer(xs, k) === reference(xs, k), s"trial $trial: n=$n k=$k xs=$xs")
    }
  }

  test("merge across split inputs equals single-pass (partial-agg correctness)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { trial =>
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(6)
      val xs = Seq.fill(n)((rnd.nextInt(5).toDouble, rnd.nextInt(15).toLong))
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = xs.splitAt(cut)
      val agg = TopKByScoreAggregate(null, null, k)
      val bl = new TopKBuffer(k); l.foreach { case (s, i) => bl.offer(s, i) }
      val br = new TopKBuffer(k); r.foreach { case (s, i) => br.offer(s, i) }
      val merged = agg.merge(bl, agg.deserialize(agg.serialize(br)))
      val (ss, ii) = merged.sortedBestFirst
      assert(ss.zip(ii).toSeq === reference(xs, k), s"trial $trial")
    }
  }

  test("NaN ranks above every real score (Spark sort order) and never throws") {
    val xs = Seq((Double.NaN, 5L), (3.0, 1L), (Double.NaN, 2L), (1.0, 9L), (2.0, 4L))
    def norm(r: Seq[(Double, Long)]) = r.map { case (s, i) => (s.isNaN, if (s.isNaN) 0.0 else s, i) }
    // Spark DESC-first ordering: NaN greatest, ties by smaller id
    assert(norm(viaBuffer(xs, 3)) ===
      norm(Seq((Double.NaN, 2L), (Double.NaN, 5L), (3.0, 1L))))
    // heap eviction keeps the NaNs when full
    assert(norm(viaBuffer(xs, 2)) === norm(Seq((Double.NaN, 2L), (Double.NaN, 5L))))
  }

  test("-0.0 and 0.0 are the same score (tie resolves by id)") {
    val xs = Seq((-0.0, 7L), (0.0, 3L), (-1.0, 1L))
    assert(viaBuffer(xs, 2) === Seq((0.0, 3L), (0.0, 7L)))
  }

  test("serialization round-trips the exact buffer contents") {
    val agg = TopKByScoreAggregate(null, null, 5)
    val b = new TopKBuffer(5)
    Seq((1.5, 3L), (2.5, 1L), (0.5, 9L), (2.5, 0L)).foreach { case (s, i) => b.offer(s, i) }
    val back = agg.deserialize(agg.serialize(b))
    val (bs, bi) = back.sortedBestFirst
    val (os, oi) = b.sortedBestFirst
    assert(bs.zip(bi).toSeq === os.zip(oi).toSeq)
  }
}
