package graft.queries

import graft.SparkSpec

/** Unit semantics for the reusable graph cores on hand-built graphs
  * (the catalog rows prove them against DuckDB on the trade graph; these
  * pin the algorithm contracts on shapes the SF data never produces). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bfsLevels: chain assigns hop counts, maxLvl bounds reach, unreachable absent") {
    // 0 -> 1 -> 2 -> 3 -> 4 (directed chain), node 9 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = GraphQueries.bfsLevels(edges, seeds, maxLvl = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3),
      "chain levels wrong or maxLvl bound ignored")
  }

  test("bfsLevels: multi-source takes the MINIMUM hop count per node") {
    // two seeds converging on node 2: 0 -> 1 -> 2 and 5 -> 2
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(0L, 5L).toDF("id")
    val got = GraphQueries.bfsLevels(edges, seeds, maxLvl = 3)
      .as[(Long, Int)].collect().toMap
    // node 2 is 2 hops from seed 0 but 1 hop from seed 5 -> lvl 1
    assert(got === Map(0L -> 0, 5L -> 0, 1L -> 1, 2L -> 1, 3L -> 2))
  }

  test("bfsLevels: a revisited node never re-enters the frontier (cycle terminates)") {
    // 0 -> 1 -> 0 cycle plus a tail; visited anti-join must stop the loop
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L)).toDF("src", "dst")
    val got = GraphQueries.bfsLevels(edges, Seq(0L).toDF("id"), maxLvl = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("bfsLevels: the visited set is a union of per-round checkpoints, never re-checkpointed") {
    // round-14 shape contract: only each round's delta frame is lineage-cut
    // (one LogicalRDD leaf per round + the seed frame), and the result is
    // their union read directly — re-checkpointing the accumulated union
    // every round would re-serialize the whole visited set per round
    // (O(rounds²) serialize work under MEMORY_AND_DISK_SER) and show up
    // here as a SINGLE LogicalRDD leaf
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val levels = GraphQueries.bfsLevels(edges, Seq(0L).toDF("id"), maxLvl = 3)
    val leaves = levels.queryExecution.optimizedPlan.collectLeaves()
    val rddLeaves = leaves.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(leaves.length === 4 && rddLeaves.length === 4,
      s"expected 4 per-round LogicalRDD leaves (seed + 3 rounds), got " +
        s"${rddLeaves.length} of ${leaves.length}: ${leaves.map(_.nodeName)}")
  }
}
