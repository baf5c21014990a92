package graft.plans

import graft.SparkSpec
import graft.functions.Vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native bounded top-k aggregate: bit-equivalence against the
  * row_number-window formulation (including ties and short groups), and
  * the plan property that justifies it — partial (map-side) aggregation,
  * no window, no per-group sort of the full candidate set. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: 8 groups x 400 candidates with
  // heavy score ties (scores quantized to 1 dp) to exercise the id
  // tiebreak, plus a group smaller than k
  private lazy val rows = {
    val big = for {
      g <- 0 until 8
      c <- 0 until 400
    } yield (g.toLong, ((g * 31 + c * 17) % 97 % 10).toDouble / 10, (c * 7 % 401).toLong)
    val small = Seq((99L, 0.5, 1L), (99L, 0.7, 2L))
    (big ++ small).toDF("g", "score", "id")
      .select(col("g"), col("score").cast("double").as("score"), col("id"))
  }

  private val k = 5

  test("matches the row_number window form exactly, ties and short groups included") {
    val viaWindow = rows
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= k)
      .select("g", "rn", "score", "id")

    val viaAgg = rows
      .groupBy("g")
      .agg(Vectors.topKByScore(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rn"),
        col("col.score").as("score"), col("col.id").as("id"))

    val w = viaWindow.orderBy("g", "rn").collect().toSeq
    val a = viaAgg.orderBy("g", "rn").collect().toSeq
    assert(a === w)
    // the short group keeps its 2 rows, best first
    val short99 = a.filter(_.getLong(0) == 99L).map(r => (r.getDouble(2), r.getLong(3)))
    assert(short99 === Seq((0.7, 2L), (0.5, 1L)))
  }

  test("duplicate (score, id) pairs across partitions merge like the window form") {
    // same rows fed twice: duplicates count twice in both formulations
    val doubled = rows.union(rows).repartition(7, col("id"))
    val viaWindow = doubled
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= k)
      .select("g", "rn", "score", "id")
      .orderBy("g", "rn").collect().toSeq
    val viaAgg = doubled.groupBy("g")
      .agg(Vectors.topKByScore(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rn"),
        col("col.score").as("score"), col("col.id").as("id"))
      .orderBy("g", "rn").collect().toSeq
    assert(viaAgg === viaWindow)
  }

  test("plans as a partial+final object-hash aggregate, not a window") {
    val agg = rows.groupBy("g")
      .agg(Vectors.topKByScore(col("score"), col("id"), k).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topkbyscoreaggregate") ||
      plan.toLowerCase.contains("partial"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
