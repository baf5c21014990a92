package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native Morton interleave vs the declarative div/mod twin
  * (DataOpsQueries.mortonSql — the form the DuckDB oracle runs): bit
  * equivalence across the input domain, SQL registration, boundary
  * values. */
class MortonSpec extends SparkSpec {

  /** The declarative 10-bit interleave, as k_zorder_cluster's oracle
    * computes it. */
  private def declarative(x: String, y: String): String =
    (0 until 10).flatMap { i =>
      Seq(
        s"(($x div ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  test("native == declarative on the full 1024x64 sampled grid") {
    val g = spark.range(0, 65536).select(
      (col("id") % 1024).as("px"),
      ((col("id") * 37) % 1024).as("sy"))
    val diff = g.select(
      expr("graft_morton(px, sy)").as("native"),
      expr(s"${declarative("px", "sy")}").as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() === 0)
  }

  test("scala kernel boundaries: zero, max 16-bit, asymmetry") {
    assert(MortonInterleaveExpression.interleave(0L, 0L) === 0L)
    // x occupies even bits, y odd bits
    assert(MortonInterleaveExpression.interleave(1L, 0L) === 1L)
    assert(MortonInterleaveExpression.interleave(0L, 1L) === 2L)
    assert(MortonInterleaveExpression.interleave(0xFFFFL, 0L) === 0x55555555L)
    assert(MortonInterleaveExpression.interleave(0L, 0xFFFFL) === 0xAAAAAAAAL)
    assert(MortonInterleaveExpression.interleave(0xFFFFL, 0xFFFFL) === 0xFFFFFFFFL)
    // bits above 16 are masked off (the caller contract: bucketed keys)
    assert(MortonInterleaveExpression.interleave(0x10000L, 0L) === 0L)
  }

  test("registered in SQL via GraftExtensions") {
    val out = spark.sql("SELECT graft_morton(3, 5) AS m").collect().head.getLong(0)
    // 3 = 0b11 on even bits -> 0b0101; 5 = 0b101 on odd bits -> 0b100010
    assert(out === (0x5L | 0x22L))
  }
}
