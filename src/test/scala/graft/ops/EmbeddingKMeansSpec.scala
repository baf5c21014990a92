package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class EmbeddingKMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "v")

  private def cents(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("cid", "cv")

  test("assign picks the nearest centroid; ties go to the smallest cid") {
    val v = vecs(
      0L -> Seq(0.0, 0.0),   // nearest c0
      1L -> Seq(10.0, 10.0), // nearest c1
      2L -> Seq(5.0, 5.0))   // equidistant -> c0
    val c = cents(0L -> Seq(1.0, 1.0), 1L -> Seq(9.0, 9.0))
    val out = EmbeddingKMeans.assign(v, c)
      .select("vec_id", "cluster", "dist").orderBy("vec_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toSeq ===
      Seq(0L -> 0L, 1L -> 1L, 2L -> 0L))
    // dist is the round-6 squared L2
    assert(out(0).getDouble(2) === 2.0) // (1-0)^2 * 2
    assert(out(2).getDouble(2) === 32.0) // (5-1)^2 * 2 vs (9-5)^2 * 2: tie
  }

  test("recenter computes exact per-coordinate means") {
    val assigned = Seq(
      (0L, 7L, Seq(1.0, 2.0)),
      (1L, 7L, Seq(3.0, 6.0)),
      (2L, 9L, Seq(10.0, 20.0))).toDF("vec_id", "cluster", "v")
    val c = EmbeddingKMeans.recenter(assigned)
      .orderBy("cid").as[(Long, Seq[Double])].collect()
    assert(c === Array(7L -> Seq(2.0, 4.0), 9L -> Seq(10.0, 20.0)))
  }

  test("fit separates well-separated clusters and is deterministic across runs") {
    // 3 tight blobs far apart; seeds (ids 0,1,2) land one per blob, so two
    // Lloyd iterations must label each blob uniformly
    val blob = (center: Double, ids: Range) =>
      ids.map(i => (i.toLong, Seq(center + (i % 3) * 0.01f, center - (i % 5) * 0.01f)))
    val data = (blob(0.0, 0 to 0) ++ blob(100.0, 1 to 1) ++ blob(200.0, 2 to 2) ++
      blob(0.0, 3 to 12) ++ blob(100.0, 13 to 22) ++ blob(200.0, 23 to 32))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), transform(col("embedding"), _.cast("float")).as("embedding"))
    val run1 = EmbeddingKMeans.fit(data, k = 3, iters = 2)
      .select("vec_id", "cluster", "dist").orderBy("vec_id").collect()
    val run2 = EmbeddingKMeans.fit(data, k = 3, iters = 2)
      .select("vec_id", "cluster", "dist").orderBy("vec_id").collect()
    assert(run1 === run2, "k-means fit is not deterministic")
    val byBlob = run1.groupBy(r => r.getLong(0) match {
      case i if i == 0 || (i >= 3 && i <= 12) => 0
      case i if i == 1 || (i >= 13 && i <= 22) => 1
      case _ => 2
    })
    byBlob.foreach { case (b, rows) =>
      assert(rows.map(_.getLong(1)).distinct.length === 1,
        s"blob $b split across clusters")
    }
    assert(byBlob.values.map(_.head.getLong(1)).toSeq.distinct.length === 3)
  }

  test("assignment stays row-local: no shuffle and no window on the vector side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.SparkPlan
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val vectors = emb.select(col("vec_id"),
      graft.functions.Vectors.toDouble(col("embedding")).as("v"))
    val seeds = vectors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val p = EmbeddingKMeans.assign(vectors, seeds).queryExecution.executedPlan
    def all[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++ p.collect {
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)(pf)
      }.flatten
    // the only exchanges allowed are the (k-row) packed-centroid agg and
    // its broadcast — the n-row vector side must contribute none, and the
    // crossJoin+row_number anti-pattern (an n×k WindowExec) must be absent
    assert(all(p) { case w: WindowExec => w }.isEmpty,
      "assignment grew an n×k window")
    // the only exchange permitted is the k-row packed-centroid global agg
    // (partial -> single-partition final); the vector side contributes none
    assert(all(p) { case e: ShuffleExchangeExec => e }.length <= 1,
      "vector side of the assignment grew a shuffle")
  }
}
