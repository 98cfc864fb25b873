package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Finds interpreted-evaluation expressions in a query's declared
  * physical plan. A [[CodegenFallback]] node breaks whole-stage
  * codegen for its whole expression tree AND evaluates via boxed
  * `eval()` per row — cheap in a bounded reduction, a multiplier on a
  * per-row corpus path (the round-10 lesson: the lambda shingle
  * pipeline re-tokenized ~7x per row until replaced with the
  * codegen'd `graft_shingles`; see functions/Shingles.scala). The
  * PlanAuditSpec pin built on this walker keeps the next operator from
  * silently reintroducing one.
  *
  * Walks `sparkPlan` (pre-AQE, the ExchangeBudgets convention) plus
  * all subquery plans, and collects the simple class name of every
  * expression tree node marked CodegenFallback.
  */
object CodegenAuditSupport {
  def fallbackClasses(df: DataFrame): Set[String] = {
    val root = df.queryExecution.sparkPlan
    // NOT subqueriesAll: a DynamicPruningSubquery at the pre-AQE stage
    // is a PlanExpression[LogicalPlan] — type erasure lets it through
    // subqueriesAll's pattern and the LogicalPlan→SparkPlan cast blows
    // at use (first hit: q_fact_dt_scan's DPP dim subquery, r13).
    // Collect the plans untyped and keep only the physical ones; a
    // logical DPP build side is re-audited in its own right when the
    // dim-side plan is physical-planned at execution.
    def physicalSubqueries(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val direct = p
        .collect { case n => n }
        .flatMap(_.expressions)
        .flatMap(_.collect {
          case e: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
            e.plan
        })
        .collect { case sp: org.apache.spark.sql.execution.SparkPlan => sp }
      direct ++ direct.flatMap(physicalSubqueries)
    }
    (root +: physicalSubqueries(root))
      .flatMap(p => p.collect { case n => n })
      .flatMap(_.expressions)
      .flatMap(_.collect { case cf: CodegenFallback => cf.getClass.getSimpleName })
      .toSet
  }
}
