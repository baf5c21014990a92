package graft.queries

import graft.functions.{Num, Vectors}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-pattern operators: the techniques a 100 TB deployment leans on,
  * expressed as oracle-checked queries so their semantics-neutrality is
  * proven (same answers as the naive plan, different shuffle shape).
  */
object ScaleQueries {
  import Num.{d, dec}

  val qs: Seq[Q] = Seq(
    Q(
      "skew_salted_agg",
      """Two-stage salted aggregation over a heavily skewed key domain
        |(5 event types x 2M rows at sf1): stage 1 aggregates on
        |(key, salt=hash%16) spreading each hot key over 16 reducers;
        |stage 2 folds the 16 partials. Salting is semantics-neutral for
        |algebraic aggregates — the oracle is the plain GROUP BY. At local
        |scale AQE would handle this; at cluster scale pre-salting beats
        |runtime skew-split because it never materializes the hot
        |partition.""".stripMargin,
      Some(
        """SELECT event_type,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
          |       CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS max_value
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val stage1 = Tables.events(s, dir)
          .groupBy(col("event_type"), pmod(col("event_id"), lit(16)).as("salt"))
          .agg(
            count(lit(1)).as("pn"),
            sum(dec(col("value"))).as("psum"),
            max(dec(col("value"))).as("pmax"))
        stage1.groupBy("event_type")
          .agg(
            sum(col("pn")).as("n"),
            d(sum(col("psum"))).as("sum_value"),
            d(max(col("pmax"))).as("max_value"))
          .orderBy("event_type")
      }),

    Q(
      "skew_salted_lineitem",
      """The salted-aggregation pattern again, on lineitem/l_returnflag (3
        |hot keys over the whole table — the classic reducer-skew shape).
        |Twin of skew_salted_agg on a second table so the technique's
        |oracle evidence survives any single table's schema drift (the
        |round-6 events regeneration killed every events-coupled query;
        |the salting pattern itself is table-agnostic and should not die
        |with its demo table).""".stripMargin,
      Some(
        """SELECT l_returnflag,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          |       CAST(MAX(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS max_qty
          |FROM lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin),
      (s, dir) => {
        val stage1 = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("salt"))
          .agg(
            count(lit(1)).as("pn"),
            sum(dec(col("l_quantity"))).as("psum"),
            max(dec(col("l_quantity"))).as("pmax"))
        stage1.groupBy("l_returnflag")
          .agg(
            sum(col("pn")).as("n"),
            d(sum(col("psum"))).as("sum_qty"),
            d(max(col("pmax"))).as("max_qty"))
          .orderBy("l_returnflag")
      }),

    Q(
      "ann_ivf_cells",
      """IVF-style ANN: a deterministic coarse quantizer (the first 8
        |vectors as centroids), every vector assigned to its nearest
        |centroid's cell (one broadcast pass), then probes search ONLY
        |their own cell. The inverted-file structure is what scales: the
        |expensive pairwise cosine runs against |cell| candidates instead
        |of the corpus, and cells co-partition. Probes 10..19; top-3 per
        |probe; assignment ties break by centroid id, ranking by (cos
        |desc, cand id) — fully deterministic both engines.""".stripMargin,
      Some {
        val cos = (a: String, b: String) =>
          s"""round(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))
             |  / (sqrt(list_sum(list_transform($a, x -> x * x)))
             |     * sqrt(list_sum(list_transform($b, x -> x * x)))), 6)""".stripMargin
        s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cents AS (SELECT vec_id AS cent_id, v AS cv FROM b WHERE vec_id < 8),
           |assign AS (
           |  SELECT vec_id, cell, v FROM (
           |    SELECT b.vec_id, cents.cent_id AS cell, b.v,
           |           ROW_NUMBER() OVER (PARTITION BY b.vec_id
           |                              ORDER BY ${cos("b.v", "cents.cv")} DESC, cents.cent_id) AS rn
           |    FROM b, cents)
           |  WHERE rn = 1),
           |probes AS (SELECT vec_id AS probe_id, cell, v AS pv FROM assign
           |           WHERE vec_id >= 10 AND vec_id < 20),
           |scored AS (
           |  SELECT probe_id, a.vec_id AS cand_id, probes.cell AS cell,
           |         ${cos("pv", "a.v")} AS cos
           |  FROM probes JOIN assign a ON probes.cell = a.cell AND a.vec_id <> probe_id)
           |SELECT probe_id, cand_id, cell, cos, rn FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           |                               ORDER BY cos DESC, cand_id) AS rn
           |  FROM scored)
           |WHERE rn <= 3
           |ORDER BY probe_id, rn""".stripMargin
      },
      (s, dir) => {
        val b = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val cents = b.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("cent_id"))
        val assign = b.crossJoin(broadcast(cents))
          .withColumn("ccos", Vectors.cosine(col("embedding"), col("cv")))
          .withColumn("rn", row_number().over(wAssign))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"))
        val probes = assign.filter(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("probe_id"), col("cell"), col("embedding").as("pv"))
        val wRank = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
        assign.select(col("vec_id").as("cand_id"), col("cell"), col("embedding").as("cv"))
          .join(broadcast(probes), Seq("cell"))
          .filter(col("cand_id") =!= col("probe_id"))
          .withColumn("cos", Vectors.cosine(col("pv"), col("cv")))
          .withColumn("rn", row_number().over(wRank))
          .filter(col("rn") <= 3)
          .select("probe_id", "cand_id", "cell", "cos", "rn")
          .orderBy("probe_id", "rn")
      }))
}
