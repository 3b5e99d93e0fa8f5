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
  * capacity × partitions, same as Flink's per-subtask capacity).
  *
  * Execution context: futures run on `ExecutionContext.global`, constructed
  * INSIDE `mapPartitions` because an EC is not serializable and must not be
  * captured in the closure. On an executor this is one shared ForkJoinPool
  * per JVM — the analog of Flink's per-TaskManager async pool; requests are
  * expected to be I/O-bound (the pool is not a CPU budget).
  */
object AsyncLookup {

  /** Input-order emission (Flink orderedWait) WITHOUT head-of-line blocking
    * of the request window: a reorder buffer holds up to `capacity`
    * INCOMPLETE requests; while the oldest (the only emittable one) is
    * still running, every slot freed by a completing successor is refilled
    * immediately, so one slow call delays only emission, never the launch
    * of later requests. */
  def orderedWait[I, O: Encoder](ds: Dataset[I], capacity: Int,
                                 timeout: Duration)(asyncFn: I => Future[O]): Dataset[O] = {
    ds.mapPartitions { iter =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      new Iterator[O] {
        // FIFO reorder buffer: emission order == launch order == input order
        private val buffer = scala.collection.mutable.Queue.empty[Future[O]]
        private def fill(): Unit =
          while (buffer.count(!_.isCompleted) < capacity && iter.hasNext)
            buffer += asyncFn(iter.next())
        override def hasNext: Boolean = { fill(); buffer.nonEmpty }
        override def next(): O = {
          fill()
          val head = buffer.head
          while (!head.isCompleted) {
            // wake on ANY completion so freed slots refill while the head
            // runs. The pending snapshot can be EMPTY if every future
            // (including head) completed between the loop check and the
            // filter — firstCompletedOf(Nil) never completes, so awaiting it
            // would burn the whole timeout; re-check the head instead.
            val pending = buffer.filter(!_.isCompleted).toSeq
            if (pending.nonEmpty) Await.ready(Future.firstCompletedOf(pending), timeout)
            fill()
          }
          buffer.dequeue()
          Await.result(head, Duration.Zero)
        }
      }
    }
  }

  /** Completion-order emission (Flink unorderedWait): a rolling window of
    * `capacity` in-flight requests; whichever finishes first is emitted and
    * its slot refilled, so one slow call never blocks the pipeline. */
  def unorderedWait[I, O: Encoder](ds: Dataset[I], capacity: Int,
                                   timeout: Duration)(asyncFn: I => Future[O]): Dataset[O] = {
    ds.mapPartitions { iter =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      new Iterator[O] {
        private val inFlight = scala.collection.mutable.ArrayBuffer.empty[Future[O]]
        private def fill(): Unit =
          while (inFlight.size < capacity && iter.hasNext) inFlight += asyncFn(iter.next())
        override def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        override def next(): O = {
          fill()
          Await.ready(Future.firstCompletedOf(inFlight.toSeq), timeout)
          val idx = inFlight.indexWhere(_.isCompleted)
          val done = inFlight.remove(idx)
          Await.result(done, Duration.Zero)
        }
      }
    }
  }
}
