package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block lifecycle for iterative localCheckpoint loops (PageRank, KCore,
  * SSSP, ConnectedComponents, RandomWalks — the round-7 verdict's finding
  * #3): `Dataset.localCheckpoint()` is EAGER, persisting the iteration's
  * rows as executor blocks, but nothing unpersists them — each loop left
  * one block set per iteration alive until the ContextCleaner's
  * reference-queue GC caught up. Within one long-lived session (the
  * 175-query bench suite, a production driver) those superseded blocks
  * accumulate into real memory pressure and evict the page cache the
  * later queries wanted.
  *
  * `free` explicitly unpersists the blocks behind a checkpointed frame.
  * Safe exactly when the frame is SUPERSEDED: the next iteration's
  * checkpoint has already materialized (eager), so nothing will ever
  * recompute through the freed one — which is also why this must never
  * be called on a frame that feeds the loop's final result (RandomWalks'
  * per-step traces are output, not scaffolding, and are not freed).
  *
  * Mechanism: a checkpointed Dataset's plan IS a single [[LogicalRDD]]
  * root whose `rdd` field is the persisted internal RDD — unpersisting
  * that RDD (non-blocking) drops the blocks. `free` acts ONLY when the
  * analyzed plan root itself is a LogicalRDD: a non-checkpointed frame
  * (or a frame DERIVED from a checkpoint — joins/projections that merely
  * reference shared checkpoint leaves, like LabelPropagation's `sym` or
  * Hits' edge frames) is a no-op, so a future misuse can never unpersist
  * a block set another frame still reads (localCheckpoint blocks are
  * unrecomputable after unpersist — a leaf-walking free would silently
  * kill shared state).
  */
object Checkpoints {

  /** Unpersist the block set behind `df` when `df` is itself a
    * checkpoint root (no-op for every other plan shape — see object
    * doc). Call only on superseded iteration state. */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => silencing { lr.rdd.unpersist(blocking = false) }
    case _ => ()
  }

  /** Spark WARNs "locally checkpointed … cannot be recomputed after
    * unpersisting" on every free — legitimate in general, pure noise
    * here (unrecomputability of a frame nothing will ever re-read is the
    * point), and dozens of them would crowd the driver's log tail. The
    * suppression is SCOPED: the logger's level is raised only around the
    * unpersist call and restored after, so the mutation never leaks to
    * the rest of the process (the warning is emitted synchronously
    * inside RDD.unpersist, before the async block removal). */
  private val warnLogger = "org.apache.spark.rdd.MapPartitionsRDD"

  private def silencing(body: => Unit): Unit = {
    val prev =
      try {
        val lvl = org.apache.logging.log4j.LogManager.getLogger(warnLogger)
          .getLevel
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          warnLogger, org.apache.logging.log4j.Level.ERROR)
        Option(lvl)
      } catch { case _: Throwable => None }
    try body
    finally prev.foreach { lvl =>
      try org.apache.logging.log4j.core.config.Configurator.setLevel(
        warnLogger, lvl)
      catch { case _: Throwable => () }
    }
  }
}
