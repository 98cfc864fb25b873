package graft.operators

/** The session gap shared by every layer: an event starting more than
  * 10 minutes after the user's previous one opens a new visit. Plays
  * the role of the reference's per-day TTL'd state
  * (UniqueVisitApp.java:78-118) and its 10 s CEP window
  * (UserJumpDetailApp.java:85-99), scaled to the test data. Batch
  * operators, streaming mirrors, and the DuckDB oracles (INTERVAL 600
  * SECOND) must all agree on this value.
  */
object Sessions {
  val GapSeconds = 600L
  val GapMs: Long = GapSeconds * 1000
  /** Gap in MICROSECONDS — the resolution both engines share. DuckDB
    * reads the parquet TIMESTAMP(NANOS) truncated to micros, so oracle
    * gap arithmetic can never observe nanos; the Spark side therefore
    * compares at micros too (`ts_us`), with `event_id` (unique) as the
    * deterministic tie-break. */
  val GapUs: Long = GapMs * 1000
  val GapNs: Long = GapMs * 1000 * 1000
}
