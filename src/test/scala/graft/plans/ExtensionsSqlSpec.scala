package graft.plans

import graft.SparkSpec
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Every native expression is reachable from SQL (GraftExtensions
  * registration), and the SQL path agrees with the Column API path. */
class ExtensionsSqlSpec extends SparkSpec {
  import spark.implicits._

  test("graft_sorted_intersect_count from SQL") {
    val n = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L,3L,5L,7L), array(3L,4L,5L,9L)) AS n")
      .as[Int].head()
    assert(n === 2)
  }

  test("graft_topk from SQL matches the Column API aggregate") {
    Seq((1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.9, 9L), (2L, 0.1, 20L))
      .toDF("g", "score", "id").createOrReplaceTempView("scored")
    val viaSql = spark.sql(
      "SELECT g, graft_topk(score, id, 2) AS top FROM scored GROUP BY g ORDER BY g")
      .select($"g", $"top".cast("string")).as[(Long, String)].collect().toSeq
    val viaCol = spark.table("scored")
      .groupBy("g").agg(Vectors.topKByScore(col("score"), col("id"), 2).as("top"))
      .orderBy("g")
      .select($"g", $"top".cast("string")).as[(Long, String)].collect().toSeq
    assert(viaSql === viaCol)
    // ties on score prefer the smaller id: (0.9, 9) before (0.9, 10)
    assert(viaSql.head._2.contains("[{0.9, 9}, {0.9, 10}]") ||
      viaSql.head._2 === "[{0.9, 9}, {0.9, 10}]")
  }

  test("graft_topk rejects a non-literal k") {
    Seq((1L, 0.9, 10L)).toDF("g", "score", "id").createOrReplaceTempView("scored2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_topk(score, id, CAST(id AS INT)) FROM scored2 GROUP BY g").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
