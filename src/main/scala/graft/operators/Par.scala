package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side overlap of INDEPENDENT artifact builds (optimization guide
  * §2.6 "Overlap independent jobs"): Spark schedules concurrent jobs
  * happily — actions are only sequential because driver code calls them
  * sequentially. Several composition audits build two or three eager
  * artifacts (localCheckpoint pins, memoized clusterings, scalar report
  * legs) one after another, leaving most executor slots idle between
  * per-stage barriers; building them from a small thread pool makes wall
  * time max(leg) instead of sum(legs) — on a real cluster this is exactly
  * how a fan-out audit should run (the q140 dedupQualityAudit precedent,
  * generalized).
  *
  * Safety: SparkSession is thread-safe for job submission; job
  * descriptions/groups are thread-local so concurrent legs label
  * independently. Callers must pre-materialize any SHARED memo entry
  * (e.g. [[Similarity]]'s sharedEmb) before forking, so concurrent legs
  * hit the memo instead of racing nested computeIfAbsent calls on one
  * ConcurrentHashMap. */
private[graft] object Par {

  /** Run the thunks concurrently, return results in order. Exceptions
    * propagate from whichever leg failed (after all legs settle, so no
    * leg keeps running against a torn-down fixture). Each leg captures
    * EVERY Throwable — Scala Futures complete only on NonFatal, so a leg
    * dying with a fatal error (OOM, StackOverflow) would otherwise leave
    * its future pending and hang the Await.ready below forever (ADVICE
    * r14); captured fatals rethrow on the caller thread instead. */
  def all[T](fs: (() => T)*): Seq[T] = {
    if (fs.sizeIs <= 1) return fs.map(_.apply())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = fs.map(f => Future(
        try Right(f()) catch { case t: Throwable => Left(t) }))
      // settle every leg before the first failure can throw
      futures.foreach(f => Await.ready(f, Duration.Inf))
      val settled = futures.map(f => Await.result(f, Duration.Inf))
      settled.collectFirst { case Left(t) => throw t }
      settled.collect { case Right(v) => v }
    } finally pool.shutdown()
  }

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val r = all(() => a.asInstanceOf[AnyRef], () => b.asInstanceOf[AnyRef])
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val r = all(() => a.asInstanceOf[AnyRef], () => b.asInstanceOf[AnyRef],
      () => c.asInstanceOf[AnyRef])
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }
}
