package graft.plans

import graft.SparkSpec
import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Native fused cosine vs the declarative formulation: bit equivalence on
  * real embedding pairs, SQL registration. */
class CosineSpec extends SparkSpec {

  test("native == builtins bit-for-bit on 1000 real embedding pairs") {
    val e = Tables.embeddings(spark, sfSmoke)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(1000)
    val diff = pairs.select(
      Vectors.cosine(col("va"), col("vb")).as("native"),
      Vectors.cosineBuiltins(col("va"), col("vb")).as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() === 0)
  }

  test("registered in SQL; self-similarity is 1") {
    val out = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
      .collect().head.getDouble(0)
    assert(out === 1.0)
  }
}
