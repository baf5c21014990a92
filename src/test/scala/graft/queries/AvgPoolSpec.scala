package graft.queries

import graft.SparkSpec
import graft.sources.Tables

import java.math.{BigDecimal => JBD, RoundingMode}

/** Keeps the ARRAY-valued form of chunk→doc mean-pooling covered now that
  * the `emb_avg_pool` catalog query emits long-form scalar rows (the
  * driver's pandas oracle harness cannot sort an array column — round-7
  * verdict #1). The spec recomputes the pooled vectors driver-side with
  * the exact same arithmetic (DECIMAL(27,9) coordinate sums, round-6
  * HALF_UP mean) and checks the long form reassembles into them, plus the
  * doc-level invariants (dense 1..dims positions, constant n_chunks,
  * decimal-exact L2 norm).
  */
class AvgPoolSpec extends SparkSpec {

  private def round6(d: Double): Double =
    new JBD(d).setScale(6, RoundingMode.HALF_UP).doubleValue()

  test("long-form catalog rows reassemble into the exact pooled vectors") {
    val rows = Catalog.byName("emb_avg_pool").build(spark, sfSmoke).collect()
    assert(rows.nonEmpty)

    // expected pooling, recomputed independently: group chunk vectors by
    // doc (= vec_id div 4), sum each coordinate in DECIMAL(27,9), divide
    // by chunk count in double, round HALF_UP to 6 dp
    val emb = Tables.embeddings(spark, sfSmoke)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0) / 4, r.getSeq[Double](1)))
    val expected: Map[Long, (Int, Array[Double])] =
      emb.groupBy(_._1).map { case (doc, chunks) =>
        val vs = chunks.map(_._2)
        val dims = vs.head.length
        val pooled = Array.tabulate(dims) { i =>
          val sum = vs.foldLeft(JBD.ZERO) { (acc, v) =>
            acc.add(new JBD(v(i)).setScale(9, RoundingMode.HALF_UP))
          }
          round6(sum.doubleValue() / vs.length)
        }
        doc -> (vs.length, pooled)
      }

    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === expected.keySet, "doc id sets differ")
    byDoc.foreach { case (doc, docRows) =>
      val (nChunks, pooled) = expected(doc)
      // dense positions 1..dims, one row each
      assert(docRows.map(_.getInt(1)).sorted.toSeq === (1 to pooled.length),
        s"doc $doc positions not dense")
      val sorted = docRows.sortBy(_.getInt(1))
      sorted.zip(pooled).foreach { case (r, exp) =>
        assert(r.getDouble(2) === exp,
          s"doc $doc pos ${r.getInt(1)}: pooled coordinate mismatch")
      }
      // n_chunks constant per doc and equal to the true chunk count
      assert(sorted.forall(_.getLong(3) === nChunks.toLong),
        s"doc $doc n_chunks drifted")
      // norm: decimal-exact sum of squares of the round-6 coordinates
      val ssq = pooled.foldLeft(JBD.ZERO) { (acc, m) =>
        val md = new JBD(m).setScale(6, RoundingMode.HALF_UP)
        acc.add(md.multiply(md))
      }
      val norm = round6(math.sqrt(ssq.doubleValue()))
      assert(sorted.forall(_.getDouble(4) === norm), s"doc $doc norm mismatch")
    }
  }
}
