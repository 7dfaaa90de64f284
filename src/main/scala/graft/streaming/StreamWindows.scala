package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** The XQuery window clause in STREAMING mode: the same open-window
  * semantics as graft.windows.XQueryWindows (reference
  * `Executor.py:496-638`), run incrementally with per-key state in
  * `flatMapGroupsWithState` — open windows survive across
  * micro-batches and close whenever their end predicate fires, however
  * many batches later (StreamingWindowSpec proves the continuity).
  *
  * Streaming-mode deltas from the batch operator (documented, not
  * silent):
  *   - no `next` lookahead (an unbounded stream has no "next yet");
  *   - windows still open when the query stops are never emitted —
  *     streaming is inherently `only end`;
  *   - events are ordered by `orderOf` within each batch; cross-batch
  *     order is the source's responsibility (watermark + sorted
  *     ingestion), as with any order-sensitive stateful operator.
  *
  * State hygiene (the unbounded-stream contract): with `evictAfter`
  * set, a window whose end predicate never fires does NOT live
  * forever. Two eviction paths, both driven by the event-time
  * watermark (input must carry `withWatermark`):
  *   - a key that keeps flowing: at each invocation, open windows
  *     whose newest item is older than `watermark - evictAfter` are
  *     dropped (abandoned mid-stream);
  *   - a key that stops flowing: an event-time timeout at
  *     `maxEventTime + evictAfter` removes the key's whole state
  *     (index/prev included — if the key reappears later its stream
  *     position restarts at 0, the semantics of "the key went away").
  * Evicted windows are discarded, never emitted — consistent with
  * "windows still open at stop are never emitted". Without
  * `evictAfter` the operator keeps the batch semantics verbatim and
  * state is bounded only by O(open windows) per key.
  *
  * Batch iteration: sorting by `orderOf` requires materializing the
  * key's micro-batch slice (an Array, sorted in place). When the
  * upstream already delivers rows in (key, order) order — e.g. sorted
  * ingestion — pass `assumeSorted = true` to stream the iterator
  * lazily with no per-key materialization at all.
  */
object StreamWindows {

  final case class OpenW[E](sIdx: Long, startItem: E, items: List[E])
  final case class WState[E](index: Long, prev: Option[E], open: List[OpenW[E]])
  final case class ClosedW[K, E](key: K, s_idx: Long, e_idx: Long, items: Seq[E])

  /** @param start (current, prev, index) => opens a window here?
    * @param end   ((startItem, sIdx), (current, index)) => closes?
    * @param evictAfter  event-time TTL (ms) for open windows; requires
    *                    a watermark on `ds` and `eventTimeOf`
    * @param eventTimeOf event-time millis of an element (used only
    *                    with `evictAfter`)
    * @param assumeSorted input iterator is already ordered by
    *                    `orderOf` within each key — skip the sort and
    *                    iterate lazily
    */
  def xqueryWindows[K, E](
      ds: Dataset[E], keyOf: E => K, orderOf: E => Long,
      start: (E, Option[E], Long) => Boolean,
      end: ((E, Long), (E, Long)) => Boolean,
      tumbling: Boolean = false,
      evictAfter: Option[Long] = None,
      eventTimeOf: E => Long = (_: E) => 0L,
      assumeSorted: Boolean = false)(
      implicit kEnc: Encoder[K], stateEnc: Encoder[WState[E]],
      outEnc: Encoder[ClosedW[K, E]]): Dataset[ClosedW[K, E]] = {
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[WState[E], ClosedW[K, E]](
        OutputMode.Append(), timeoutConf) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            // no event within the TTL: every open window is abandoned;
            // drop the key's state entirely
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(WState[E](0L, None, Nil))
            evictAfter.foreach { ttl =>
              val wm = state.getCurrentWatermarkMs()
              if (wm > 0L) st = st.copy(open = st.open.filter(o =>
                eventTimeOf(o.items.head) >= wm - ttl))
            }
            val out = ListBuffer[ClosedW[K, E]]()
            var maxEt = Long.MinValue
            val it: Iterator[E] =
              if (assumeSorted) rows
              else {
                // one in-place array sort — no ClassTag for E here, so
                // sort the boxed array (rows are boxed at this
                // boundary anyway)
                val arr = rows.toArray[Any](scala.reflect.ClassTag.Any)
                  .asInstanceOf[Array[AnyRef]]
                arr.sortInPlaceBy(e => orderOf(e.asInstanceOf[E]))
                arr.iterator.map(_.asInstanceOf[E])
              }
            it.foreach { e =>
              if (evictAfter.isDefined)
                maxEt = math.max(maxEt, eventTimeOf(e))
              val opens = start(e, st.prev, st.index) &&
                (!tumbling || st.open.isEmpty)
              var open = if (opens) OpenW(st.index, e, Nil) :: st.open else st.open
              open = open.map(o => o.copy(items = e :: o.items))
              val (closing, staying) =
                open.partition(o => end((o.startItem, o.sIdx), (e, st.index)))
              closing.reverse.foreach(o =>
                out += ClosedW(key, o.sIdx, st.index, o.items.reverse))
              st = WState(st.index + 1, Some(e), staying)
            }
            state.update(st)
            evictAfter.foreach { ttl =>
              // clamp past the watermark: when the element type does
              // not retain the watermarked column, late rows reach
              // here and maxEt + ttl could be <= watermark (throws)
              if (maxEt > Long.MinValue) state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, maxEt + ttl))
            }
            out.iterator
          }
      }
  }
}
