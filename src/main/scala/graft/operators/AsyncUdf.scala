package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}

/** Async scalar UDF executor — the reference's AsyncUdf operator
  * (crates/arroyo-worker/src/arrow/async_udf.rs:33-495): up to
  * `maxConcurrency` calls in flight per partition, ordered or unordered
  * completion, per-call timeout.
  *
  * Spark has no async expression type, so this is a `mapPartitions` draining
  * a future pool: results re-attach as one extra column. Rows stay on
  * executors (no driver round-trip); concurrency is per-partition, so total
  * in-flight = partitions × maxConcurrency — size accordingly against the
  * external service, exactly like the reference's per-subtask cap.
  */
object AsyncUdf {

  /** Append `outCol` computed by `fn` (run asynchronously) to every row.
    *
    * Ordered mode keeps a sliding window of up to `maxConcurrency` submitted
    * futures: the head is drained while the tail keeps filling, so calls
    * genuinely overlap (wall-time ≈ n/maxConcurrency × latency, not
    * n × latency). Unordered mode emits rows in *completion* order through a
    * completion queue, never holding more than `maxConcurrency` rows in
    * flight (no whole-partition buffering).
    *
    * @param ordered  true = emit in input order (reference Ordered mode);
    *                 false = emit as completions arrive
    * @param timeoutMs per-call timeout; a timed-out call yields null
    */
  def withAsyncColumn(
      df: DataFrame,
      outCol: String,
      outType: DataType,
      fn: Row => CompletableFuture[Any],
      maxConcurrency: Int = 64,
      ordered: Boolean = true,
      timeoutMs: Long = 10000): DataFrame = {

    val outSchema = StructType(df.schema.fields :+ StructField(outCol, outType, nullable = true))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val window = math.max(1, maxConcurrency)

    df.mapPartitions { rows =>
      // orTimeout bounds every future, so a hung call surfaces as an
      // exceptional completion instead of wedging the queue/deque drain.
      def submit(r: Row): CompletableFuture[Any] =
        fn(r).orTimeout(timeoutMs, TimeUnit.MILLISECONDS)

      def value(fut: CompletableFuture[Any]): Any =
        try fut.join() catch { case _: Exception => null }

      if (ordered) {
        new Iterator[Row] {
          private val pending = new java.util.ArrayDeque[(Row, CompletableFuture[Any])](window)
          private def fill(): Unit =
            while (pending.size < window && rows.hasNext) {
              val r = rows.next()
              pending.addLast((r, submit(r)))
            }
          fill()
          override def hasNext: Boolean = !pending.isEmpty
          override def next(): Row = {
            val (r, fut) = pending.pollFirst()
            fill() // refill the window BEFORE blocking on the head
            Row.fromSeq(r.toSeq :+ value(fut))
          }
        }
      } else {
        new Iterator[Row] {
          private val done = new LinkedBlockingQueue[(Row, CompletableFuture[Any])]()
          private var inFlight = 0
          private def fill(): Unit =
            while (inFlight < window && rows.hasNext) {
              val r = rows.next()
              val fut = submit(r)
              inFlight += 1
              fut.whenComplete((_, _) => done.put((r, fut)))
            }
          fill()
          override def hasNext: Boolean = inFlight > 0
          override def next(): Row = {
            val (r, fut) = done.take() // completion order
            inFlight -= 1
            fill()
            Row.fromSeq(r.toSeq :+ value(fut))
          }
        }
      }
    }
  }
}
