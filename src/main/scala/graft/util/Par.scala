package graft.util

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Overlap INDEPENDENT Spark actions from driver threads (opt guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. The artifact build/load entry points used to chain
  * 3-6 tiny bounded actions (params table, codebook writes, metadata
  * collects) serially, so every one paid its full job-launch + commit
  * latency back-to-back; running the independent ones concurrently
  * collapses that to ~max instead of sum. At cluster scale the same
  * overlap back-fills executors through each small job's scheduling gap.
  *
  * All futures are drained before returning (never leak a running job
  * past the call), and the FIRST failure is rethrown after the drain so
  * a failed sibling cannot strand a half-written artifact tree quietly.
  */
private[graft] object Par {
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Run the thunks concurrently; block until ALL settle; rethrow the
    * first failure (in argument order) if any.
    */
  def run(thunks: (() => Unit)*): Unit = {
    val fs = thunks.map(t => Future(t()))
    val settled = fs.map(f => Await.ready(f, Duration.Inf).value.get)
    settled.collectFirst { case scala.util.Failure(e) => throw e }
  }

  /** Two independent value-producing actions, concurrently. */
  def run2[A, B](a: => A, b: => B): (A, B) = {
    val (fa, fb) = (Future(a), Future(b))
    val ra = Await.ready(fa, Duration.Inf).value.get
    val rb = Await.ready(fb, Duration.Inf).value.get
    (ra.get, rb.get)
  }

  /** Three independent value-producing actions, concurrently. */
  def run3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val (fa, fb, fc) = (Future(a), Future(b), Future(c))
    val ra = Await.ready(fa, Duration.Inf).value.get
    val rb = Await.ready(fb, Duration.Inf).value.get
    val rc = Await.ready(fc, Duration.Inf).value.get
    (ra.get, rb.get, rc.get)
  }
}
