package graft.plans

import graft.SparkSpec
import graft.functions.{Num, Quantities}
import org.apache.spark.sql.functions._

/** The native NormalizeQtyExpression: equivalence with the pure-builtins
  * formulation over a seeded random sample, null safety, and SQL
  * availability through GraftExtensions. */
class NormalizeQtySpec extends SparkSpec {
  import spark.implicits._

  test("native expression == builtin-expression chain on 1000 seeded samples") {
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(1000) {
      BigDecimal(BigInt(rnd.nextLong() % 4000000000000L), rnd.nextInt(13))
        .underlying.toPlainString
    } ++ Seq("0", "-0.0000000005", "1e-3", "123456789.987654321")
    val df = samples.toDF("q")
    val diff = df.select(
      Quantities.normalizeQty($"q").as("native"),
      Quantities.normalizeQtyBuiltins($"q").as("builtin"))
      .filter($"native" =!= $"builtin" || $"native".isNull =!= $"builtin".isNull)
    assert(diff.count() === 0)
  }

  test("null in, null out") {
    val out = Seq[Option[String]](None).toDF("q")
      .select(Quantities.normalizeQty($"q")).collect().head
    assert(out.isNullAt(0))
  }

  test("registered in SQL via GraftExtensions") {
    val out = spark.sql(
      "SELECT graft_normalize_qty(CAST('1.500000000' AS DECIMAL(38,9))) AS n")
      .collect().head.getString(0)
    assert(out === "1.5")
  }

  test("codegen path active (no fallback to interpreted)") {
    // a parquet-backed frame: local literal relations constant-fold to
    // LocalTableScan and never enter codegen at all
    val df = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select(Quantities.normalizeQty($"l_quantity").as("n"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.limit(1).as[String].collect().head.nonEmpty)
  }
}
