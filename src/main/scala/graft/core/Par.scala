package graft.core

import java.util.concurrent.atomic.AtomicReferenceArray

/** Overlap INDEPENDENT Spark actions from one caller (optimization guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. The streaming store verbs end in 2-3 independent
  * batch-sized writes (pair emission, band delta, docs delta) and the
  * capstone bodies fan one micro-batch out to 3-5 independent stores;
  * running those on one thread bills each action's FIXED cost — Catalyst
  * planning, job submission, a 1-2-task stage — serially, which the r17
  * profiles showed is where the streaming family's seconds live (~40 ms
  * × hundreds of jobs, flat across a 10× standing jump). Overlapping
  * them makes wall per trigger ≈ max instead of sum. This is a
  * fixed-overhead win at EVERY scale, not a local[32] tuning: the
  * per-action cost is driver-side and scale-independent, and on a
  * cluster the overlapped jobs additionally back-fill each other's
  * straggler tails (guide §2.6).
  *
  * Use ONLY for actions with no ordering contract between them: same-
  * trigger writes to DISTINCT paths whose crash story is already
  * "redelivery overwrites every batch-id-named output deterministically"
  * (so any completion subset is recoverable — the family's existing
  * model), or independent eager materializations. Anything delta-first
  * (e.g. [[graft.streaming.IvfStream.appendBatch]]'s delta-before-
  * profile rule) stays sequential at the call site.
  *
  * Failure semantics: every action runs to completion (a failing sibling
  * does not cancel the others — they are independent writes a re-run
  * would redo identically), then the FIRST failure in argument order is
  * rethrown, so `intercept`-style callers see the same exception a
  * sequential run would surface. Held writer leases
  * ([[graft.streaming.Versions.withLease]]) propagate to the worker
  * threads: the scope is logically the caller's, whatever thread runs
  * the write. */
object Par {

  /** Run the thunks concurrently, wait for all, return results in order.
    * Rethrows the first (argument-order) failure after all complete. */
  def eval[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.isEmpty) return Seq.empty
    if (thunks.size == 1) return Seq(thunks.head())
    val leases = graft.streaming.Versions.capturedHeld
    val out = new AtomicReferenceArray[Any](thunks.size)
    val err = new AtomicReferenceArray[Throwable](thunks.size)
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(
        { () =>
          try out.set(i, graft.streaming.Versions.withHeld(leases)(t()))
          catch { case e: Throwable => err.set(i, e) }
        }: Runnable,
        s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    thunks.indices.foreach { i =>
      val e = err.get(i)
      if (e != null) throw e
    }
    thunks.indices.map(i => out.get(i).asInstanceOf[T])
  }

  /** Run independent unit actions concurrently; wait for all. */
  def run(actions: (() => Unit)*): Unit = {
    val _ = eval(actions)
  }
}
