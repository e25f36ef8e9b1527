package graft

import graft.ops.SemDedup

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // axis-aligned clusters: ids 1-3 near +x, ids 10-11 near +y;
  // 1 and 2 are near-identical, 3 is same-cluster but distinct
  private def emb = Seq(
    (1L, Seq(1.0f, 0.0f, 0.01f)),
    (2L, Seq(1.0f, 0.0f, 0.02f)),   // near-dup of 1
    (3L, Seq(0.8f, 0.0f, 0.6f)),    // same cluster, not a dup
    (10L, Seq(0.0f, 1.0f, 0.01f)),
    (11L, Seq(0.0f, 1.0f, 0.012f))) // near-dup of 10
    .toDF("vec_id", "embedding")

  test("lowest id in each near-dup group survives, distinct members keep") {
    val r = SemDedup.report(emb, eps = 0.999, nClusters = 2, iters = 2)
      .orderBy("vec_id").collect()
    val keep = r.map(x => x.getLong(0) -> x.getLong(4)).toMap
    val dupOf = r.map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(keep === Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 10L -> 1L, 11L -> 0L))
    assert(dupOf(2L) === 1L && dupOf(11L) === 10L)
    assert(dupOf(1L) === -1L && dupOf(3L) === -1L)
  }

  test("cross-cluster near-identical vectors are NOT compared (the paper's accepted trade)") {
    // force k = number of vectors so every vector sits alone
    val r = SemDedup.report(emb, eps = 0.9, nClusters = 5, iters = 2)
      .orderBy("vec_id").collect()
    assert(r.forall(_.getLong(4) === 1L))
  }

  test("a planted giant cluster trips the size guard and sub-splits the pair join") {
    // 12 identical vectors -> one cluster of 12; cap at 6 -> 2 cells
    // by id parity. In-cell duplicates are still found; the one
    // cross-cell consequence is a second surviving head (id 1) — the
    // documented accepted miss, traded against the O(size²) join.
    val giant = (0L until 12L).map(i => (i, Seq(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = SemDedup.report(giant, eps = 0.999, nClusters = 1, iters = 1,
        maxClusterSize = 6L)
      .orderBy("vec_id").collect()
    assert(SemDedup.lastOversized.map(_._2) === Seq(12L))
    val keep = r.map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(keep === (0L until 12L).map(i =>
      i -> (if (i <= 1L) 1L else 0L)).toMap)
    // even ids dup to head 0, odd ids to head 1 (cells by id modulus)
    assert(r.filter(_.getLong(0) >= 2L)
      .forall(x => x.getLong(2) === x.getLong(0) % 2))

    // default cap: guard silent, single survivor
    val full = SemDedup.report(giant, eps = 0.999, nClusters = 1, iters = 1)
      .orderBy("vec_id").collect()
    assert(SemDedup.lastOversized.isEmpty)
    assert(full.map(_.getLong(4)).toSeq === (1L +: Seq.fill(11)(0L)))
  }

  test("oversizedAudit reports size, cells, and the convexity bound on missed pairs") {
    // two planted clusters: +x with 7 members, +y with 2; cap 3
    val vs = (0L until 7L).map(i => (i, Seq(1.0f, 0.0f, 0.001f * i))) ++
      Seq((10L, Seq(0.0f, 1.0f, 0.0f)), (11L, Seq(0.0f, 1.0f, 0.01f)))
    val r = SemDedup.oversizedAudit(vs.toDF("vec_id", "embedding"),
        eps = 0.9, nClusters = 2, iters = 2, maxClusterSize = 3L)
      .collect()
    // only the 7-cluster exceeds the cap: 3 cells (ceil 7/3); balanced
    // cells are (3,2,2) -> within-cell pairs 3+1+1=5; C(7,2)=21 -> 16
    assert(r.length === 1)
    assert(r.head.getAs[Long]("size") === 7L)
    assert(r.head.getAs[Long]("n_cells") === 3L)
    assert(r.head.getAs[Long]("pairs_missed_max") === 16L)
    // under-cap corpus: audit is empty, never null-rowed
    assert(SemDedup.oversizedAudit(vs.toDF("vec_id", "embedding"),
      eps = 0.9, nClusters = 2, iters = 2, maxClusterSize = 100L)
      .collect().isEmpty)
  }

  test("MULTIPLE oversized clusters sub-split via one broadcast join (no when-chain)") {
    // two giant clusters (12 in +x, 12 in +y), cap 6 -> both split
    // into 2 cells by id parity; duplicates are still found in-cell
    val giants = ((0L until 12L).map(i => (i, Seq(1.0f, 0.0f, 0.0f))) ++
      (100L until 112L).map(i => (i, Seq(0.0f, 1.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val r = SemDedup.report(giants, eps = 0.999, nClusters = 2, iters = 2,
        maxClusterSize = 6L)
      .orderBy("vec_id").collect()
    assert(SemDedup.lastOversized.map(_._2) === Seq(12L, 12L))
    val keep = r.map(x => x.getLong(0) -> x.getLong(4)).toMap
    // per cluster: one surviving head per parity cell (ids 0,1; 100,101)
    assert(keep === (0L until 12L).map(i =>
      i -> (if (i <= 1L) 1L else 0L)).toMap ++
      (100L until 112L).map(i => i -> (if (i <= 101L) 1L else 0L)).toMap)
    // every duplicate's survivor shares its parity (cells by id modulus)
    assert(r.filter(_.getLong(4) === 0L)
      .forall(x => x.getLong(2) % 2 === x.getLong(0) % 2))
  }

  test("eps = -1 marks everything after the cluster head as duplicate") {
    val r = SemDedup.report(emb, eps = -1.0, nClusters = 1, iters = 1)
      .orderBy("vec_id").collect()
    assert(r.map(_.getLong(4)).toSeq === Seq(1L, 0L, 0L, 0L, 0L))
    // everyone's dup_of is the global head
    assert(r.drop(1).forall(_.getLong(2) === 1L))
  }
}
