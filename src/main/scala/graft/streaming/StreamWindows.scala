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
  * State per key is O(open windows) — exactly the batch operator's
  * memory bound, made durable in the state store.
  */
object StreamWindows {

  final case class OpenW[E](sIdx: Long, startItem: E, items: List[E])
  final case class WState[E](index: Long, prev: Option[E], open: List[OpenW[E]])
  final case class ClosedW[K, E](key: K, s_idx: Long, e_idx: Long, items: Seq[E])

  /** @param start (current, prev, index) => opens a window here?
    * @param end   ((startItem, sIdx), (current, index)) => closes?
    */
  def xqueryWindows[K, E](
      ds: Dataset[E], keyOf: E => K, orderOf: E => Long,
      start: (E, Option[E], Long) => Boolean,
      end: ((E, Long), (E, Long)) => Boolean,
      tumbling: Boolean = false)(
      implicit kEnc: Encoder[K], stateEnc: Encoder[WState[E]],
      outEnc: Encoder[ClosedW[K, E]]): Dataset[ClosedW[K, E]] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[WState[E], ClosedW[K, E]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          var st = state.getOption.getOrElse(WState[E](0L, None, Nil))
          val out = ListBuffer[ClosedW[K, E]]()
          rows.toSeq.sortBy(orderOf).foreach { e =>
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
          out.iterator
      }
}
