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
    (root +: root.subqueriesAll)
      .flatMap(p => p.collect { case n => n })
      .flatMap(_.expressions)
      .flatMap(_.collect { case cf: CodegenFallback => cf.getClass.getSimpleName })
      .toSet
  }
}
