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
  val GapNs: Long = GapMs * 1000 * 1000
}
