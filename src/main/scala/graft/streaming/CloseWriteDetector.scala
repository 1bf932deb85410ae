package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The faithful analogue of the reference's close-write flush (SURVEY §7.6;
  * reference images/fluentbit/close-write-flush.patch:20-156): fluent-bit
  * watches inotify IN_CLOSE_WRITE per container log file and force-flushes
  * that tag's buffer when the container exits.
  *
  * Structured Streaming's version is a per-pod session with an inactivity
  * timeout (`flatMapGroupsWithState` + ProcessingTimeTimeout): while lines
  * arrive the state accumulates; when a pod goes quiet for `idleTimeout` the
  * state times out and a close event is emitted — the signal a downstream
  * compactor/finalizer uses exactly like the reference's `_flb_close_write`
  * sentinel.
  */
object CloseWriteDetector {

  /** One observed log line — or, with `closed = true`, an EXPLICIT close
    * marker (from [[FileCloseWatcher]]'s delete events, the engine's
    * IN_CLOSE_WRITE analogue): a marker short-circuits the inactivity
    * timeout and emits the stream's close in the SAME trigger, matching
    * the reference's ≤30 s bound instead of waiting out the idle window.
    */
  case class PodActivity(cluster: String, namespace: String, pod: String,
      container: String, time_ns: Long, closed: Boolean = false)
  case class PodSessionState(lines: Long, firstNs: Long, lastNs: Long)
  case class PodClosed(cluster: String, namespace: String, pod: String,
      container: String, lines: Long, first_ns: Long, last_ns: Long)

  /** `parsed` must carry cluster/namespace/pod/container/time_ns. Emits one
    * [[PodClosed]] per (pod, container) stream after `idleTimeout` of
    * silence — or immediately when a close MARKER row arrives (union an
    * event-driven marker stream into `parsed` for that). State is O(1) per
    * live pod — bounded by live-container count, not by data volume.
    */
  def closedStreams(parsed: Dataset[PodActivity],
      idleTimeout: String = "60 seconds"): Dataset[PodClosed] = {
    import parsed.sparkSession.implicits._
    parsed
      .groupByKey(a => (a.cluster, a.namespace, a.pod, a.container))
      .flatMapGroupsWithState[PodSessionState, PodClosed](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        onGroup(idleTimeout))
  }

  /** The per-group state transition — factored out so it is testable with
    * `TestGroupState` (processing-time timeouts cannot be driven
    * deterministically through a live query).
    */
  def onGroup(idleTimeout: String)(
      key: (String, String, String, String),
      rows: Iterator[PodActivity],
      state: GroupState[PodSessionState]): Iterator[PodClosed] = {
    val (cluster, ns, pod, container) = key
    if (state.hasTimedOut) {
      // inactivity fired ≙ IN_CLOSE_WRITE: emit the close event
      val s = state.get
      state.remove()
      Iterator(PodClosed(cluster, ns, pod, container, s.lines, s.firstNs, s.lastNs))
    } else {
      val prev = state.getOption.getOrElse(PodSessionState(0L, Long.MaxValue, Long.MinValue))
      // one pass: fold LINE rows into the session, note close markers
      // (markers carry no line — they only signal)
      var sawClose = false
      val batch = rows.foldLeft(prev) { (acc, r) =>
        if (r.closed) { sawClose = true; acc }
        else PodSessionState(acc.lines + 1,
          math.min(acc.firstNs, r.time_ns), math.max(acc.lastNs, r.time_ns))
      }
      if (sawClose) {
        // explicit close (file-watcher delete event ≙ IN_CLOSE_WRITE):
        // emit NOW, same trigger — no timeout wait. A marker for a stream
        // with no witnessed lines (state already timed out, or the watcher
        // outran the tail) emits a zero-line close; the finalizer's
        // per-generation ledger and no-op compaction absorb it.
        if (state.exists) state.remove()
        val lines = batch.lines
        Iterator(PodClosed(cluster, ns, pod, container, lines,
          if (lines == 0) 0L else batch.firstNs,
          if (lines == 0) 0L else batch.lastNs))
      } else {
        state.update(batch)
        state.setTimeoutDuration(idleTimeout)
        Iterator.empty
      }
    }
  }
}
