package graft

import org.apache.spark.sql.DataFrame

/** Invocation-scoped lifetime for eagerly-checkpointed DataFrames.
  *
  * Several operators `localCheckpoint(true)` an intermediate relation that
  * the RETURNED (lazy) plan still references — the blocks ARE the data
  * (checkpointing truncated the lineage), so the operator itself can never
  * unpersist them. Before this registry each invocation leaked its blocks
  * for the session lifetime; a bench run (91 queries × 6 passes) accreted
  * gigabytes of dead cached blocks and the end-of-run queries paid for it
  * in GC/eviction time (the BENCH_r04 pass-5 ANN spikes).
  *
  * Contract: an operator registers each checkpointed df it cannot free
  * itself; the NEXT query invocation (by which time the previous result
  * has been materialized — Verify/Bench/the driver all consume a query
  * fully before building the next) sweeps everything registered earlier.
  * At most one invocation's blocks are ever outstanding.
  */
object CacheScope {
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Track a checkpointed df whose blocks must outlive plan construction. */
  def register(df: DataFrame): DataFrame = { pending.add(df); df }

  /** Free every block registered by previous invocations. Safe to call at
    * any point where no earlier query's un-materialized plan is live.
    */
  def sweep(): Unit = {
    var df = pending.poll()
    while (df != null) {
      try df.unpersist()
      catch { case scala.util.control.NonFatal(_) => () }
      df = pending.poll()
    }
  }
}
