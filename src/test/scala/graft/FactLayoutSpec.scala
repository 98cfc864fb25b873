package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.FactLayout

/** `q_fact_dt_scan` is the REGISTERED form of the 100 TB fact-layout
  * claim (r12 verdict-6): this spec pins the files-READ metric on the
  * registered query itself, so the DPP + Z-order read path rides the
  * same gate as its oracle and budget. */
class FactLayoutSpec extends SparkSpec {

  private def factScans(df: org.apache.spark.sql.DataFrame) = {
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (executed.subqueries.flatMap(graft.sources.ScanMetrics.allScans) ++
      graft.sources.ScanMetrics.allScans(executed))
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("lineitem_dtz")))
  }

  private def filesOnDisk(path: String): Long =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("dt="))
      .map(d => Option(d.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet")).toLong).sum

  test("registered q_fact_dt_scan: DPP prunes the dt partitions (files-READ metric)") {
    val df = SparkEntry.queries("q_fact_dt_scan")(spark, sf0001)
    val rows = df.collect()
    // one quarter = at most 3 month rows (a sparse gate corpus may
    // leave a month with no rows in the clustered-column windows), all
    // inside ONE quarter (the oracle pins exact values; this pins the
    // read path)
    assert(rows.nonEmpty && rows.length <= 3,
      s"expected 1..3 month rows, got ${rows.length}")
    assert(rows.forall(_.getLong(2) > 0))
    // each row's OWN month derives its quarter (r13 advice: deriving
    // every row's quarter from rows.head could only catch year
    // boundaries, never a 03→04 month straddle within one year)
    val quarters = rows.map(r => r.getString(0).substring(0, 4) +
      "-Q" + ((r.getString(0).substring(5, 7).toInt - 1) / 3 + 1)).toSet
    assert(quarters.size == 1, s"months span quarters: $quarters")

    val (factPath, _) = FactLayout.ensureLayout(spark, sf0001)
    val total = filesOnDisk(factPath)
    val scans = factScans(df)
    assert(scans.nonEmpty, "no fact scan found in the executed plan")
    assert(scans.map(_.toString).mkString.contains("dynamicpruning"),
      "fact scan lost its dynamic-pruning subquery")
    val read = scans.map(_.metrics("numFiles").value).sum
    // ~7 years of months on disk, 3 month dirs actually read: the
    // pruned scan must touch well under a quarter of the files
    assert(read > 0 && read * 4 <= total,
      s"DPP pruning regressed: read $read of $total layout files")

    // the clustered-column predicates reach the parquet readers as
    // pushed filters (literals, not join-derived)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("l_partkey") && pushed.contains("l_suppkey"),
      s"clustered-column predicates not pushed: $pushed")

    // rows actually emitted by the fact scans stay a small fraction of
    // the corpus (partition pruning + footer skipping compose)
    val emitted = scans.map(_.metrics("numOutputRows").value).sum
    val corpus = Tables.lineitem(spark, sf0001).count()
    assert(emitted * 4 <= corpus,
      s"fact scans emitted $emitted of $corpus rows — pruning not effective")
  }
}
