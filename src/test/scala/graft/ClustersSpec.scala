package graft

import graft.operators.{Clusters, Dedup}

/** Ground truth for the connected-components contraction (the
  * dedup-cluster operator): planted component structures, convergence
  * on adversarial chain graphs, and agreement with a driver-side
  * union-find over the real near-dup pairs. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("planted components resolve to their minimum ids") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 8L), (20L, 30L)))
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      8L -> 8L, 9L -> 8L,
      20L -> 20L, 30L -> 20L))
  }

  test("long chain converges (the adversarial diameter case)") {
    // a 200-node path: naive min propagation needs 200 rounds, the
    // star contraction must finish inside the default 25
    val chain = (0L until 199L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.size === 200)
    assert(labels.values.forall(_ == 0L))
  }

  test("orientation, duplicates and self-loops are normalized away") {
    val labels = cc(Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 5L), (7L, 3L)))
    assert(labels === Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("empty edge set yields an empty mapping") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("dedup clusters agree with a union-find over the jaccard pairs") {
    val pairs = Dedup.ngramJaccard(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find ground truth (test-only; the operator
    // itself never collects the graph)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Clusters.dedupClusters(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // each cluster label is the minimum member of the cluster
    got.groupBy(_._2).foreach { case (root, members) =>
      assert(members.keys.min === root)
    }
    // the survivor set is exactly: all docs minus non-canonical members
    val all = Tables.documents(spark, sf001).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val losers = got.collect { case (d, r) if d != r => d }.toSet
    val survivors = Clusters.dedupSurvivors(spark, sf001).collect()
      .map(_.getLong(0)).toSet
    assert(survivors === all -- losers)
  }

  test("repetition metrics match a hand computation") {
    val docs = Seq(
      (1L, "a b a b a b"),     // bigrams: ab,ba,ab,ba,ab → top 3/5
      (2L, "x y z"),           // no repeats
      (3L, "w w w w")          // bigrams all "w w"
    ).toDF("doc_id", "text")
    // the documents path is oracle-checked; here exercise the column
    // logic on planted text via the same expressions
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.shingles
    val m = docs
      .select(col("doc_id"),
        shingles(col("text"), 2).as("bg"), shingles(col("text"), 3).as("tg"))
      .select(col("doc_id"),
        array_max(transform(array_distinct(col("bg")),
          x => size(filter(col("bg"), y => y === x)))).cast("double")
          .divide(size(col("bg"))).as("top"),
        (lit(1.0) - size(array_distinct(col("tg"))).cast("double") / size(col("tg")))
          .as("dup3"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L)._1 === 3.0 / 5.0)
    assert(m(1L)._2 === 1.0 - 2.0 / 4.0) // aba,bab,aba,bab → 2 distinct of 4
    assert(m(2L)._1 === 1.0 / 2.0)
    assert(m(2L)._2 === 0.0)
    assert(m(3L)._1 === 1.0)             // "w w" ×3 of 3
    assert(m(3L)._2 === 1.0 - 1.0 / 2.0)
    // the shipped operator's sort+run-length top count agrees with the
    // naive count-per-distinct form used for the hand numbers above
    val viaOp = docs
      .select(col("doc_id"), shingles(col("text"), 2).as("bg"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.topCount(col("bg")).cast("double")
          .divide(size(col("bg"))).as("top"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaOp === m.map { case (k, v) => k -> v._1 })
  }
}
