package graft

/** Guards the driver contract: every registered query must run and
  * return rows at sf0.001, every oracle key must have a query, and
  * results must be stable across two executions (determinism — the
  * driver hash-compares). */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query runs, returns rows, and is deterministic at sf0.001") {
    val problems = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val first = fn(spark, sf0001).collect()
        if (first.isEmpty) Some(s"$name: empty result")
        else {
          val second = fn(spark, sf0001).collect()
          if (first.map(_.toString).toSeq != second.map(_.toString).toSeq)
            Some(s"$name: nondeterministic across runs")
          else None
        }
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("corpus invariant the props-explode oracle depends on: props is exactly {\"k\": digits}") {
    import org.apache.spark.sql.functions._
    // dwd_props_explode's DuckDB oracle enumerates the single key 'k'
    // (json_each is unavailable offline); if the generated corpus ever
    // carries other keys / nulls / dirty JSON, this names the coupling
    // before the driver's hash compare breaks mysteriously
    val bad = Tables.events(spark, sf0001)
      .filter(!col("props").rlike("""^\{"k": \d+\}$"""))
      .count()
    assert(bad === 0, s"$bad props rows violate the single-key invariant")
  }

  test("entry() returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }

  test("BASELINE.md budget table matches BenchBudgets.budgets exactly") {
    // The repo rule is "update BOTH files in the same commit"; round 4
    // shipped with 12 rows missing and 5 stale values in the markdown.
    // This makes the rule mechanical: parse the table, diff the map.
    val rowRe = """\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|""".r
    val lines = scala.io.Source.fromFile("BASELINE.md", "UTF-8").getLines().toSeq
    val table = lines.collect { case rowRe(q, b) => q -> b.toDouble }.toMap
    val missing = BenchBudgets.budgets.keySet -- table.keySet
    val extra = table.keySet -- BenchBudgets.budgets.keySet
    assert(missing.isEmpty, s"in BenchBudgets but not BASELINE.md: $missing")
    assert(extra.isEmpty, s"in BASELINE.md but not BenchBudgets: $extra")
    val stale = BenchBudgets.budgets.collect {
      case (q, b) if math.abs(table(q) - b) > 0.005 => s"$q md=${table(q)} scala=$b"
    }
    assert(stale.isEmpty, s"stale values: ${stale.mkString(", ")}")
  }
}
