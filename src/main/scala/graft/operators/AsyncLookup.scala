package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.{Dataset, Encoder}

/** Async I/O operator — analog of the reference's AsyncDataStream
  * (flink-streaming-java/src/main/java/org/apache/flink/streaming/api/
  * functions/async/AsyncFunction.java, AsyncDataStream#unorderedWait):
  * per-partition bounded-concurrency enrichment against an external service.
  *
  * This is deliberately the brief's (d) tier — `mapPartitions` as a last
  * resort — because an external RPC cannot be expressed as a Catalyst plan.
  * The capacity bound is per PARTITION (so cluster-wide in-flight requests =
  * capacity × partitions, same as Flink's per-subtask capacity). Requests
  * within a capacity-sized batch run concurrently; emission preserves input
  * order — i.e. Flink's orderedWait semantics with batch-granular
  * concurrency.
  */
object AsyncLookup {

  def orderedWait[I, O: Encoder](ds: Dataset[I], capacity: Int,
                                 timeout: Duration)(asyncFn: I => Future[O]): Dataset[O] = {
    ds.mapPartitions { iter =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      iter.grouped(capacity).flatMap { batch =>
        val inFlight = batch.map(asyncFn) // `capacity` requests in flight
        Await.result(Future.sequence(inFlight), timeout)
      }
    }
  }

  @deprecated("emission is input-ordered; use orderedWait", "0.1.0")
  def unorderedWait[I, O: Encoder](ds: Dataset[I], capacity: Int,
                                   timeout: Duration)(asyncFn: I => Future[O]): Dataset[O] =
    orderedWait(ds, capacity, timeout)(asyncFn)
}
