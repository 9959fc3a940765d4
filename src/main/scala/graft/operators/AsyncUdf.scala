package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import java.util.concurrent.{CompletableFuture, Semaphore}
import scala.jdk.CollectionConverters._

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

    df.mapPartitions { rows =>
      val sem = new Semaphore(maxConcurrency)
      val inFlight = new java.util.concurrent.ConcurrentLinkedQueue[(Row, CompletableFuture[Any])]()

      def complete(row: Row, fut: CompletableFuture[Any]): Row = {
        val v = try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch { case _: Exception => null }
        Row.fromSeq(row.toSeq :+ v)
      }

      if (ordered) {
        // sliding window of futures, emitted in submission order
        val buffered = rows.map { r =>
          sem.acquire()
          val fut = fn(r).whenComplete((_, _) => sem.release())
          (r, fut)
        }
        buffered.map { case (r, f) => complete(r, f) }
      } else {
        // drain completions as they finish
        rows.foreach { r =>
          sem.acquire()
          val fut = fn(r).whenComplete((_, _) => sem.release())
          inFlight.add((r, fut))
        }
        inFlight.asScala.iterator.map { case (r, f) => complete(r, f) }
      }
    }
  }
}
