package graft.queries

/** The full query catalog. Every SURVEY.md §2 operator the engine claims is
  * represented here by at least one named query (plus ScalaTest specs for
  * the non-relational surface).
  */
object Catalog {
  val all: Seq[Q] =
    CoreQueries.qs ++ ReportQueries.qs ++ LookupQueries.qs ++ AggWindowQueries.qs ++
      ScalarQueries.qs ++ TextQueries.qs ++ DedupQueries.qs ++ SimilarityQueries.qs ++
      NestedQueries.qs ++ MultimodalQueries.qs ++ ScaleQueries.qs ++ AsofRangeQueries.qs ++
      SamplingQueries.qs ++ StateQueries.qs ++ ClusterQueries.qs ++ CurationQueries.qs ++
      StreamingQueries.qs ++ SketchQueries.qs ++ GraphQueries.qs ++ DataOpsQueries.qs ++
      SubqueryQueries.qs ++ GeoQueries.qs ++ StatsQueries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.size == all.size, "duplicate query names in catalog")
}
