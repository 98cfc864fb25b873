package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-execution scan metrics: the files/bytes a query ACTUALLY read
  * after partition pruning — the measured form of the 100 TB
  * dt-layout claim (SURVEY §4). Shared by the DtBench harness and the
  * FileSourcesSpec gate test so the pruning regression check and the
  * benchmark read the same walker.
  *
  * AQE buries scans inside materialized QueryStageExec subtrees, which
  * `plan.collect` does not descend into (and a cached-plan stage wraps
  * its own nested AdaptiveSparkPlanExec) — recurse through both. Read
  * the metrics from the SAME DataFrame you executed: `df.count()`
  * plans a separate QueryExecution and leaves these untouched.
  */
object ScanMetrics {

  def allScans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect { case f: FileSourceScanExec => f } ++
      plan.collect {
        case q: QueryStageExec => q.plan
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.flatMap(allScans)

  /** (numFiles, filesSize) summed over every parquet scan in the
    * executed plan, subqueries included. */
  def filesRead(df: DataFrame): (Long, Long) = {
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.subqueries.flatMap(allScans) ++ allScans(executed)
    (scans.map(_.metrics("numFiles").value).sum,
      scans.map(_.metrics("filesSize").value).sum)
  }

  /** Rows the scans actually EMITTED — numFiles/filesSize are
    * PLANNING-time numbers (post partition pruning, pre reader), while
    * parquet row-group skipping from pushed predicates happens at READ
    * time: a file whose footer stats exclude the predicate emits ~0
    * rows. This is the measured form of the Z-order claim. */
  def rowsScanned(df: DataFrame): Long = {
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.subqueries.flatMap(allScans) ++ allScans(executed)
    scans.map(_.metrics("numOutputRows").value).sum
  }
}
