package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side collection of bounded statistics results. */
object Jobs {

  /** Collect a driver-bounded statistics result (a one-row aggregate, a
    * capped distinct list, an argmax row) with AQE disabled for the
    * action: AQE materializes every exchange as its own query-stage JOB,
    * which doubles per-action scheduling overhead on tiny stat plans that
    * have nothing to re-optimize — one exchange, a handful of rows out.
    * Measured 0.25–0.3 s off the e2e pipeline's four stat jobs at sf0.1
    * ([[graft.tools.AqeProbe]]); corpus-scale queries keep AQE, where it
    * earns its stages.
    *
    * The toggle is a session-conf set/restore around the action. A
    * concurrent query starting on the same session inside that window
    * would run without AQE — a performance effect only, never a
    * correctness one; the engine's stat collects are sequential
    * driver-blocking steps, so the window is the action itself.
    */
  def collectFast(df: DataFrame): Array[Row] = {
    val conf = df.sparkSession.conf
    val prev = conf.get("spark.sql.adaptive.enabled", "true")
    if (prev == "false") df.collect()
    else {
      conf.set("spark.sql.adaptive.enabled", "false")
      try df.collect()
      finally conf.set("spark.sql.adaptive.enabled", prev)
    }
  }
}
