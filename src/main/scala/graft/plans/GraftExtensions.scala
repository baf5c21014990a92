package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions so they are callable from SQL as well as the Column API.
  * Install via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize_qty"),
      new ExpressionInfo(classOf[NormalizeQtyExpression].getName, "graft_normalize_qty"),
      (children: Seq[Expression]) => NormalizeQtyExpression(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpression].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarityExpression(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCountExpression].getName,
        "graft_sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCountExpression(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[MortonInterleaveExpression].getName, "graft_morton"),
      (children: Seq[Expression]) =>
        MortonInterleaveExpression(children.head, children(1))))
    // aggregate: graft_topk(score, id, k) with k a literal int
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScoreAggregate].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        if (children.size != 3)
          throw new IllegalArgumentException(
            s"graft_topk(score, id, k) takes 3 arguments, got ${children.size}")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
              if v.isValidInt => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be a literal integer, got $other")
        }
        TopKByScoreAggregate(children.head, children(1), k).toAggregateExpression()
      }))
  }
}
