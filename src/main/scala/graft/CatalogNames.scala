package graft

/** Dev tool: print every catalog query name, one per line — the input
  * `tools/gate.py` diffs against the newest SCALEVERIFY artifact so a
  * query added after the at-scale gate ran cannot slip into a round
  * unverified (round-9 verdict: two snapshot-commit queries landed with
  * no 5x row). Needs no SparkSession; runs in ~1 s.
  *   tools/run.sh graft.CatalogNames
  */
object CatalogNames {
  def main(args: Array[String]): Unit =
    graft.queries.Catalog.all.map(_.name).sorted.foreach(println)
}
