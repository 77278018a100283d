package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

/** Injectable processing-time clock.
  *
  * The reference stamps processing time with `now()` (NEXMark q12,
  * benchmarks/src/nexmark/query/q12.sql:1; flock-function window/global.rs
  * :42-148), which makes those queries inherently nondeterministic. SURVEY
  * §7 lists "processing-time determinism in tests" as a hard point and
  * prescribes an injectable clock: production uses the wall clock; under
  * `spark.graft.proctime.mode=deterministic` the caller-supplied arrival
  * model is used instead (a paced replay — e.g. event time plus a constant
  * pipeline latency), making the query output a pure function of its input
  * and therefore oracle-checkable.
  *
  * This mirrors how Flink/Beam test harnesses swap `TimeService` clocks;
  * the query SHAPE (stamp then window on the stamp) is identical in both
  * modes, only the clock source changes.
  */
object ProcTime {
  val ModeKey = "spark.graft.proctime.mode"
  val Deterministic = "deterministic"

  /** Processing-time stamp column: wall clock by default, the given
    * deterministic arrival model when the session opts in.
    */
  def stamp(s: SparkSession, arrivalModel: Column): Column =
    if (s.conf.get(ModeKey, "wallclock") == Deterministic) arrivalModel
    else current_timestamp()
}
