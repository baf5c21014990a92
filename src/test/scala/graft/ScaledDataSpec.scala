package graft

import java.nio.file.Files

import graft.ops.NearDup
import org.apache.spark.sql.functions._

/** The scale-curve replica generator's invariants — the measurement is
  * only valid if copies are mutually invisible: row counts scale exactly,
  * key spaces are disjoint per copy, foreign keys stay internally
  * consistent (each copy joins only itself), and replicated documents
  * never near-dup-pair across copies (which would grow candidates
  * quadratically in N and measure the replication artifact, not the
  * operator).
  */
class ScaledDataSpec extends SparkSpec {

  private lazy val outDir = {
    val dir = Files.createTempDirectory("scaled-data").toString
    ScaledData.generate(spark, sfSmoke, dir, copies = 2)
    dir
  }

  test("row counts scale by exactly the copy factor, schemas unchanged") {
    ScaledData.tables.foreach { t =>
      val src = spark.read.parquet(s"$sfSmoke/$t.parquet")
      val out = spark.read.parquet(s"$outDir/$t.parquet")
      withClue(t) {
        assert(out.count() === 2 * src.count())
        assert(out.schema === src.schema)
      }
    }
  }

  test("key spaces are disjoint per copy and FKs stay internally consistent") {
    val orders = spark.read.parquet(s"$outDir/orders.parquet")
    val customer = spark.read.parquet(s"$outDir/customer.parquet")
    // copy 0 keys < shift, copy 1 keys >= shift: no overlap
    val shift = ScaledData.KeyShift
    assert(orders.filter(col("o_orderkey") >= shift).count() ===
      orders.filter(col("o_orderkey") < shift).count())
    // every order's customer exists, and in the SAME copy
    val joined = orders.join(customer, col("o_custkey") === col("c_custkey"))
    assert(joined.count() === orders.count())
    assert(joined.filter(
      (col("o_orderkey") >= shift) =!= (col("c_custkey") >= shift)).count() === 0)
  }

  test("blocking keys stay copy-local: source and label never span copies") {
    // source is the blocked-Jaccard blocking key, label the ANN one: if a
    // copy shared either with another copy, blocked all-pairs work would
    // grow quadratically in N (the replication artifact, not the operator)
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val srcSpan = docs.groupBy("source")
      .agg(countDistinct(floor(col("doc_id") / ScaledData.KeyShift)).as("n_copies"))
      .filter(col("n_copies") > 1)
    assert(srcSpan.count() === 0, "a source block spans copies")
    // and per-copy block sizes are unchanged from the base data
    val baseMax = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .groupBy("source").count().agg(max("count")).first().getLong(0)
    val outMax = docs.groupBy("source").count().agg(max("count")).first().getLong(0)
    assert(outMax === baseMax, "replication grew a source block")
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val labSpan = emb.groupBy("label")
      .agg(countDistinct(floor(col("vec_id") / ScaledData.KeyShift)).as("n_copies"))
      .filter(col("n_copies") > 1)
    assert(labSpan.count() === 0, "a label block spans copies")
  }

  test("replicated documents never near-dup-pair across copies") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val shift = lit(ScaledData.KeyShift)
    // a bounded slice is enough: a replica of doc d would pair with
    // d + shift if the token suffix failed
    val pairs = NearDup.confirmedPairs(docs.filter(col("doc_id") % shift < 50))
    assert(pairs.filter(
      (col("doc_a") < shift) =!= (col("doc_b") < shift)).count() === 0)
  }
}
