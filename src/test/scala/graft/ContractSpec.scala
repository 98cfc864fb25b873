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

  /** Ops whose OUTPUT legitimately depends on partition merge order.
    * EMPTY since r11: the two former members became invariant when r8
    * promoted them to guarantee-witness cards — `q_quantile_approx`
    * emits exact counts + rank-guarantee flags (the merge-order-
    * dependent estimates stay on `quantilesApproxRaw`, spec-asserted),
    * and `q_heavy_hitters` emits the EXACT frequent set at the n/k
    * threshold (the MG sketch only PRUNES candidates; which extra
    * sub-threshold candidates survive pruning varies with merge order
    * but they are filtered out by the exact-count cut). Every
    * registered query now reproduces itself under any partitioning. */
  private val mergeOrderSensitive = Set.empty[String]

  test("every query is partitioning-invariant at sf0.001 (the oracle-compare premise)") {
    // the DuckDB hash compare only works because results do not depend
    // on HOW Spark partitioned the work: decimal money sums, struct
    // tie-breaks, integer quantization everywhere. Prove it wholesale:
    // re-run every query under a different shuffle partitioning and
    // demand identical collected output.
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val baseline = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => mergeOrderSensitive(n) }
      .map { case (name, fn) => name -> fn(spark, sf0001).collect().map(_.toString).toSeq }
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val drifted = baseline.flatMap { case (name, expect) =>
        try {
          val got = SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSeq
          if (got != expect) Some(s"$name: differs under 7 shuffle partitions") else None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(100)}")
        }
      }
      assert(drifted.isEmpty, drifted.mkString("\n"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
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

  test("bench compact line carries value_remeasured next to value (r13 verdict-4)") {
    // the driver parses only the ~2000-char stdout tail; the raw sweep
    // total under mid-sweep contention misreads as a regression unless
    // the contention-corrected total rides the SAME line
    val line = Bench.compactLine(238.4, 192.8, 199, 199, "[]", "{}",
      """{"query":"q1_pricing_summary"}""", "/root/testdata/sf0.1", "/tmp/b.json")
    assert(line.contains("\"value\":238.40"), line)
    assert(line.contains("\"value_remeasured\":192.80"), line)
    // substituted total can only be <= the raw total (re-measure
    // replaces a contended capture, never inflates a clean one) — the
    // emitter's map-substitution invariant callers rely on
    assert(line.indexOf("\"value\":") < line.indexOf("\"value_remeasured\":"))
    // one line, no interior newline — the tail-capture premise
    assert(!line.trim.contains("\n"))
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
    // the prose summary drifts silently unless pinned too: r8 shipped
    // three new rows with the '195 queries / 285.3 s' line untouched
    val totalRe = """Total of budgets: ([0-9.]+) s \((\d+) queries\)""".r
    val total = lines.flatMap(l => totalRe.findFirstMatchIn(l)).headOption
      .getOrElse(fail("BASELINE.md is missing the 'Total of budgets: X s (N queries)' line"))
    assert(total.group(2).toInt == BenchBudgets.budgets.size,
      s"summary line says ${total.group(2)} queries, BenchBudgets has ${BenchBudgets.budgets.size}")
    val sum = BenchBudgets.budgets.values.sum
    assert(math.abs(total.group(1).toDouble - sum) < 0.05,
      f"summary line says ${total.group(1)} s, budgets sum to $sum%.1f s")
  }
}
