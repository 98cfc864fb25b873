package graft

/** Custom logical/physical plan nodes ((c) in the preference order:
  * compose built-ins → custom `Expression` → custom plan node →
  * `mapPartitions`).
  *
  * Deliberately empty in round 1: every operator in SURVEY.md §2 —
  * including the ones Spark has no operator for (as-of join, range
  * join, banded LSH) — decomposed into Catalyst-optimizable built-in
  * compositions, and a custom `SparkStrategy` would only hide those
  * plans from AQE's runtime re-planning (skew splits, partition
  * coalescing, join-strategy switches). The two justified drops below
  * the DataFrame level live in [[graft.functions]]:
  * [[graft.functions.RollingHash64]] (scalar `Expression` with
  * `doGenCode`) and [[graft.functions.SimHashAgg]]
  * (`TypedImperativeAggregate`), both injected via
  * [[graft.GraftExtensions]].
  *
  * If a future operator genuinely cannot be expressed — e.g. an
  * order-preserving merge with custom spill semantics — its
  * `LogicalPlan` + `Rule[LogicalPlan]` + `SparkStrategy` + `SparkPlan`
  * belong here, registered through the same `GraftExtensions` entry
  * point (`injectPlannerStrategy` / `injectOptimizerRule`).
  */
package object plans
