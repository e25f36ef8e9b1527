package graft

import graft.ops.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    graft.core.CacheScope.withScope {
      PageRank.ranks(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

  test("a symmetric 2-cycle is a fixed point at uniform mass") {
    // each node passes its whole rank to the other: 150000 +
    // 850000 * 1000000 // 1000000 = 1000000 forever
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 4)
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("hand-computed star: two exact integer rounds") {
    // center 1 <-> leaves 2, 3. odeg: 1->2, 2->1, 3->1.
    // round 1: shares 1: 500000 each way, 2: 1e6, 3: 1e6
    //   r(1) = 150000 + 850000*2000000//1e6 = 1850000
    //   r(2) = r(3) = 150000 + 850000*500000//1e6 = 575000
    // round 2: shares 1: 925000, 2: 575000, 3: 575000
    //   r(1) = 150000 + 850000*1150000//1e6 = 1127500
    //   r(2) = r(3) = 150000 + 850000*925000//1e6 = 936250
    val es = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
    assert(ranks(es, iters = 1) ===
      Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    assert(ranks(es, iters = 2) ===
      Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("rank orders by in-link mass; duplicates in the edge list collapse") {
    // 4 pages all linking to 0, 0 linking back only to 1; edge list
    // carries duplicates that must not double the flow
    val es = Seq((1L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (0L, 1L), (0L, 1L))
    val r = ranks(es, iters = 3)
    assert(r(0L) > r(1L))       // the hub dominates
    assert(r(1L) > r(2L))       // the hub's sole target beats the rest
    assert(r(2L) === r(3L) && r(3L) === r(4L)) // symmetric tails tie
    // tails receive nothing: base mass only
    assert(r(2L) === 150000L)
  }

  test("dangling mass leaks, never crashes: a pure sink keeps receiving") {
    val r = ranks(Seq((1L, 2L)), iters = 3) // 2 has no out-edge
    assert(r(2L) > r(1L))
    assert(r(1L) === 150000L) // 1 receives nothing after round 1
  }
}
