package graft

import org.apache.spark.sql.functions._

import graft.operators.Ckpt

/** Pins the [[graft.operators.Ckpt]] release contract the iterative
  * loops (Clusters star-contraction, Graph bfs/label_prop/kcore,
  * dimUpsertStream's batch state) now depend on: a superseded round's
  * checkpoint blocks leave storage memory IMMEDIATELY on release —
  * not at driver GC — while the successor frame stays readable. The
  * r11 10× sweep measured the leak this prevents: edge-list-sized
  * round frames pinned across a whole session degraded
  * dedup_survivors 238 s in-batch vs 15.6 s with the discipline. */
class CkptSpec extends SparkSpec {

  test("release drops a superseded checkpoint from the persistent-RDD set; successor unaffected") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val a = spark.range(1000).toDF("v").localCheckpoint()
    val b = a.select((col("v") * 2).as("v")).localCheckpoint()
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size == 2, s"expected 2 new checkpoint RDDs, saw ${added.size}")
    Ckpt.release(a)
    val afterRelease = sc.getPersistentRDDs.keySet -- before
    assert(afterRelease.size == 1,
      s"release must unpin exactly the superseded frame; still pinned: $afterRelease")
    // the successor was materialized before release — fully readable
    assert(b.count() == 1000)
    assert(b.agg(sum(col("v"))).head().getLong(0) == 999000L)
    Ckpt.release(b)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("release is a no-op on frames that are not checkpoint-backed") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = Tables.lineitem(spark, sf0001).limit(5)
    Ckpt.release(df) // parquet scan: no LogicalRDD anywhere
    assert(df.count() == 5)
    assert(sc.getPersistentRDDs.keySet == before)
  }

  test("release on a DERIVED view over a live checkpoint is a no-op (root-match contract)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val base = spark.range(500).toDF("v").localCheckpoint()
    val derived = base.filter(col("v") % 2 === 0).select((col("v") + 1).as("w"))
    // derived's analyzed plan CONTAINS base's LogicalRDD but is not a
    // bare checkpoint — releasing it must not unpersist an RDD the
    // caller does not own (a released local checkpoint has no lineage)
    Ckpt.release(derived)
    assert((sc.getPersistentRDDs.keySet -- before).size == 1,
      "release on a derived view unpersisted the shared parent checkpoint")
    assert(base.count() == 500) // parent still fully readable
    Ckpt.release(base)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("the star-contraction loop leaves no intermediate round pinned after the query") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    import spark.implicits._
    // a chain + a triangle: needs >1 contraction round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("u", "v")
    val cc = graft.operators.Clusters.connectedComponents(edges)
    assert(cc.count() > 0)
    val pinned = sc.getPersistentRDDs.keySet -- before
    // only the FINAL round frame (backing the returned result) may
    // remain; every superseded round must have been released in-loop
    assert(pinned.size <= 1,
      s"star-contraction left ${pinned.size} round frames pinned — release discipline broken")
  }
}
