package graft.retry

/** Driver-side retry combinator with the reference's semantics
  * (decorators.py:5-40): up to `retries` attempts, fixed `delay`
  * between them, each failure logged, the last exception re-raised
  * after exhaustion.
  *
  * This guards connector/driver-side calls only — task-level retry on
  * a cluster is Spark's own `spark.task.maxFailures`.
  */
object Retry {

  def withRetry[T](
      retries: Int = 3,
      delayMillis: Long = 5000L,
      log: String => Unit = _ => ())(f: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < retries) {
      attempt += 1
      try {
        return f
      } catch {
        case e: Throwable =>
          last = e
          log(s"attempt $attempt/$retries failed: ${e.getMessage}")
          if (attempt < retries) Thread.sleep(delayMillis)
      }
    }
    throw last
  }
}
