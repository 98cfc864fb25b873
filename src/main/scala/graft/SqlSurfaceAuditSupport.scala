package graft

import org.apache.spark.sql.DataFrame

/** Classifies a query's ANALYZED logical plan for SQL-surface
  * reachability (the CodegenAuditSupport recipe applied to the SQL
  * story): a plan containing typed/object operators or an RDD-backed
  * root cannot be written as one `spark.sql` statement over
  * `Graft.registerViews` + the registered `graft_*` functions —
  * everything else can (modulo driver-derived plan literals, which
  * SqlSurfaceAuditSpec declares separately because the FINAL plan
  * cannot reveal them).
  */
object SqlSurfaceAuditSupport {
  /** Logical node names with no `spark.sql` text form: the typed
    * Dataset API (object serde, map/flatMap groups, per-partition
    * imperative logic) and `LogicalRDD` (a localCheckpoint'd frame —
    * the visible end of a driver-side iteration). */
  private val NoSqlSurface = Set(
    "LogicalRDD",
    "FlatMapGroupsWithState", "TransformWithState",
    "MapPartitions", "MapElements", "MapGroups", "CoGroup",
    "AppendColumns", "AppendColumnsWithObject",
    "DeserializeToObject", "SerializeFromObject", "TypedFilter")

  def sqlBlockers(df: DataFrame): Set[String] = {
    val root = df.queryExecution.analyzed
    (root +: root.subqueriesAll)
      .flatMap(p => p.collect {
        case n if NoSqlSurface.contains(n.nodeName) => n.nodeName
      })
      .toSet
  }
}
