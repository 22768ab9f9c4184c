package graft.tebis

/** Driver-side retry with linear backoff (reference S14: catalog fetch
  * retried <=10x with `sleep(i)`, then fatal; client construction retried
  * once — csv_extractor.py:55-65, main.py:99-104). Executor-side work is
  * covered by Spark task retries (`spark.task.maxFailures`) instead. */
object Retry {
  def withLinearBackoff[T](
      maxAttempts: Int = 10,
      sleepMs: Long => Long = i => i * 1000L,
      onError: (Int, Throwable) => Unit = (_, _) => ())(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        // NonFatal only: interrupts and JVM errors must propagate
        case scala.util.control.NonFatal(e) if attempt < maxAttempts =>
          onError(attempt, e)
          Thread.sleep(sleepMs(attempt.toLong))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
