package graft.streaming

import java.nio.file.{FileSystems, Files, Path, Paths, StandardWatchEventKinds, WatchKey}
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Event-driven close detection: the engine's analogue of the reference's
  * inotify `IN_CLOSE_WRITE` patch (close-write-flush.patch:20-101 — the
  * fluent-bit side watches each container log file and force-flushes its
  * tag within 30 s of the container exiting).
  *
  * The JVM's WatchService exposes create/modify/delete, not close-write.
  * Two durable "this stream is done" signals exist in the kubelet layout,
  * and one ambiguous one:
  *
  *  - **Directory reap** (`<ns>_<pod>_<uid>/` or its `<container>/` child
  *    deleted): the pod is gone — close immediately.
  *  - **Log-file delete**: ambiguous. Pod deletion removes `0.log`, but so
  *    does kubelet/CRI log ROTATION of a live container (rename
  *    `0.log` → `0.log.<ts>` reports a DELETE of the old name followed by
  *    a CREATE). A live, still-logging container must NOT be finalized —
  *    so file deletes are DEBOUNCED: the marker fires `debounceMs` after
  *    the delete unless a new `*.log*` entry appears in the same dir in
  *    the window (the rotation's rename target and/or its fresh `0.log`).
  *  - **Write quiescence** (opt-in, `quiesceMs > 0`): a container that
  *    exited 0 with its log file RETAINED (reference test.sh:592-598)
  *    produces no delete at all. With ENTRY_MODIFY tracked per file, a
  *    sweep emits a close marker once a file has been silent for
  *    `quiesceMs` (set it to the reference's 30 s bound in production).
  *    The JVM cannot distinguish "closed writer" from "slow writer"; a
  *    spurious close splits a stream into two PodClosed generations,
  *    which the finalizer's ledger + re-entrant compaction absorb
  *    (CloseWriteSpec covers the reborn path) — the cost is an extra
  *    compaction, never data loss. Default off; the detector's
  *    inactivity timeout remains the marker-less fallback.
  *
  * Each signal becomes one [[CloseWriteDetector.PodActivity]] MARKER
  * (`closed = true`), which [[CloseWriteDetector.closedStreams]] turns
  * into a [[CloseWriteDetector.PodClosed]] in the SAME trigger.
  *
  * Driver-side and O(live directories): one watch registration per pod/
  * container dir, one tiny callback per event — never data-plane. Scale
  * note: this watches the NODE-LOCAL log tree (the reference's fluent-bit
  * runs per node as a DaemonSet); a 1000-node cluster runs 1000 tail
  * ingests, each with its own watcher on its own /var/log/pods.
  */
final class FileCloseWatcher(podsRoot: String,
    onClose: CloseWriteDetector.PodActivity => Unit,
    cluster: String,
    debounceMs: Long = 2000L,
    quiesceMs: Long = 0L) extends AutoCloseable {

  private val watcher = FileSystems.getDefault.newWatchService()
  private val running = new AtomicBoolean(true)
  private val rootPath = Paths.get(podsRoot)
  private val scheduler = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, s"graft-close-watcher-timer-$podsRoot")
    t.setDaemon(true); t
  }
  /** container dir → its pending debounced close (cancelled by rotation). */
  private val pending = new ConcurrentHashMap[Path, ScheduledFuture[_]]()
  /** pod dir → container names seen under it (for pod-dir reap closes). */
  private val containers = new ConcurrentHashMap[Path, java.util.Set[String]]()
  /** log file → last observed write millis (quiescence tracking only). */
  private val lastWrite = new ConcurrentHashMap[Path, java.lang.Long]()

  /** `<ns>_<pod>_<uid>` dir name → (namespace, pod); None for non-pod dirs
    * (and the fluent-bit decoy exclusion rides the same rule as ingest:
    * the path filter there drops them before the store, so a spurious
    * close marker for one is harmless — nothing to finalize).
    */
  private def podOf(dirName: String): Option[(String, String)] =
    dirName.split('_') match {
      case Array(ns, pod, _uid) => Some((ns, pod))
      case _ => None
    }

  private def register(dir: Path): Unit = {
    val kinds = Seq(StandardWatchEventKinds.ENTRY_CREATE,
      StandardWatchEventKinds.ENTRY_DELETE) ++
      (if (quiesceMs > 0) Seq(StandardWatchEventKinds.ENTRY_MODIFY) else Nil)
    dir.register(watcher, kinds: _*)
    Option(dir.getParent).filter(_ != rootPath.getParent)
      .filter(p => podOf(p.getFileName.toString).isDefined)
      .foreach { podDir =>
        containers.computeIfAbsent(podDir, _ => ConcurrentHashMap.newKeySet[String]())
          .add(dir.getFileName.toString)
      }
    // register existing children too (tree walk is cheap: pods × containers);
    // the listing stream holds an open directory handle — close it. Existing
    // log files seed quiescence tracking: a container that exited BEFORE the
    // watcher started (or across a watcher restart) has a retained, silent
    // file that will never produce a MODIFY — without the seed it would wait
    // out the idle timeout, the exact case quiescence exists to short-cut.
    val listing = Files.list(dir)
    try listing.iterator().asScala.foreach { child =>
      if (Files.isDirectory(child)) register(child)
      else if (quiesceMs > 0 && child.getFileName.toString.endsWith(".log"))
        lastWrite.put(child, System.currentTimeMillis())
    } finally listing.close()
  }

  register(rootPath)

  /** One close marker for `containerDir`, if its parent parses as a pod. */
  private def emit(containerDir: Path): Unit = {
    val container = containerDir.getFileName.toString
    Option(containerDir.getParent).map(_.getFileName.toString)
      .flatMap(podOf).foreach { case (ns, pod) =>
        onClose(CloseWriteDetector.PodActivity(
          cluster, ns, pod, container,
          time_ns = System.currentTimeMillis() * 1000000L,
          closed = true))
      }
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Scheduled tasks must never let an exception escape: a one-shot that
    * throws loses its marker silently (the future is never observed), and a
    * periodic that throws is CANCELLED by the executor — quiescence would
    * be dead for the process lifetime with no log line.
    */
  private def guarded(what: String)(body: => Unit): Runnable = () =>
    try body
    catch { case e: Exception => log.warn(s"close-watcher $what failed: $e") }

  private def cancelPending(containerDir: Path): Unit =
    Option(pending.remove(containerDir)).foreach(_.cancel(false))

  private def schedulePending(containerDir: Path): Unit = {
    val task = guarded(s"debounced close ($containerDir)") {
      pending.remove(containerDir); emit(containerDir)
    }
    Option(pending.put(containerDir,
      scheduler.schedule(task, debounceMs, TimeUnit.MILLISECONDS)))
      .foreach(_.cancel(false))
  }

  /** Does `dir` still hold any live `*.log`? Kubelet keeps one log per
    * container RESTART (`<restartCount>.log`): its GC deleting a stale
    * sibling (0.log while the live 1.log keeps logging) must not close the
    * container. Listing at delete time is O(files in one container dir).
    */
  private def hasLiveLog(dir: Path): Boolean = {
    try {
      val listing = Files.list(dir)
      try listing.iterator().asScala
        .exists(_.getFileName.toString.endsWith(".log"))
      finally listing.close()
    } catch { case _: java.io.IOException => false } // dir itself gone
  }

  private def handleEvent(dir: Path, kind: java.nio.file.WatchEvent.Kind[_],
      name: String): Unit = {
    val full = dir.resolve(name)
    kind match {
      case StandardWatchEventKinds.ENTRY_CREATE =>
        if (Files.isDirectory(full))
          // a new pod or container dir: start watching it
          try register(full)
          catch { case _: java.io.IOException => () } // raced its delete
        else if (name.contains(".log")) {
          // rotation's rename target (`0.log.<ts>`) or its fresh `0.log`:
          // the container is alive — cancel any debounced close for it
          cancelPending(dir)
          if (quiesceMs > 0 && name.endsWith(".log"))
            lastWrite.put(full, System.currentTimeMillis())
        }
      case StandardWatchEventKinds.ENTRY_MODIFY =>
        if (name.endsWith(".log")) {
          if (quiesceMs > 0) lastWrite.put(full, System.currentTimeMillis())
          // a write is proof of life: cancel any debounced close racing it
          cancelPending(dir)
        }
      case StandardWatchEventKinds.ENTRY_DELETE =>
        if (name.endsWith(".log")) {
          // ambiguous (pod delete vs live rotation vs restart-sibling GC):
          // if ANOTHER live log remains in the dir the container is still
          // logging — not a close; otherwise debounce (rotation's CREATE
          // cancels, a true teardown lets it fire)
          lastWrite.remove(full)
          if (!hasLiveLog(dir)) schedulePending(dir)
        } else if (podOf(name).isDefined && dir == rootPath) {
          // pod dir reaped: close every container we saw under it
          Option(containers.remove(full)).foreach(_.asScala.toSeq.sorted
            .foreach { c => cancelPending(full.resolve(c)); emit(full.resolve(c)) })
        } else if (Option(dir.getFileName).map(_.toString).flatMap(podOf).isDefined) {
          // container dir reaped (name is the container): unambiguous close
          Option(containers.get(dir)).foreach(_.remove(name))
          cancelPending(full)
          emit(full)
        }
      case _ => ()
    }
  }

  private def loop(): Unit = {
    while (running.get()) {
      val key: WatchKey =
        try watcher.take()
        catch { case _: java.nio.file.ClosedWatchServiceException => return }
      val dir = key.watchable().asInstanceOf[Path]
      key.pollEvents().asScala.foreach { ev =>
        // OVERFLOW has a null context — never dereference before the kind
        // check, and never let one bad event kill the watcher thread
        if (ev.kind() != StandardWatchEventKinds.OVERFLOW) {
          try handleEvent(dir, ev.kind(), ev.context().toString)
          catch { case e: Exception =>
            log.warn(s"close-watcher event dropped ($dir): $e")
          }
        }
      }
      key.reset()
    }
  }

  /** Quiescence sweep, grouped PER CONTAINER DIR: a restarted container
    * retains its silent `0.log` next to the live `1.log` (kubelet keeps one
    * file per restart), so a per-file sweep would emit a spurious close
    * ~quiesceMs after every restart. Quiescence is a container property —
    * the dir closes only when EVERY tracked sibling has been silent ≥
    * quiesceMs. Entries are dropped on close so a still-live slow writer
    * re-arms on its next write; a write racing the sweep (conditional
    * remove fails) vetoes the emit — the container just proved it's alive.
    */
  private def sweepQuiescent(): Unit = {
    val cutoff = System.currentTimeMillis() - quiesceMs
    lastWrite.entrySet().asScala.toSeq
      .groupBy(e => Option(e.getKey.getParent))
      .foreach { case (dirOpt, entries) =>
        if (entries.forall(_.getValue <= cutoff)) {
          // map (no short-circuit), so every sibling's removal outcome is
          // known: on a veto the already-removed siblings are re-inserted
          // (putIfAbsent — a racing write's fresher timestamp wins), or a
          // silently-untracked sibling would later suppress the dir's
          // debounce close via hasLiveLog with no quiescence entry left
          val removed = entries.map(e =>
            (e, lastWrite.remove(e.getKey, e.getValue)))
          if (removed.forall(_._2)) dirOpt.foreach(emit)
          else removed.foreach { case (e, wasRemoved) =>
            if (wasRemoved) lastWrite.putIfAbsent(e.getKey, e.getValue)
          }
        }
      }
  }

  if (quiesceMs > 0) {
    val period = math.max(quiesceMs / 4, 50L)
    scheduler.scheduleWithFixedDelay(guarded("quiescence sweep")(sweepQuiescent()),
      period, period, TimeUnit.MILLISECONDS)
  }

  private val thread = new Thread(() => loop(), s"graft-close-watcher-$podsRoot")
  thread.setDaemon(true)
  thread.start()

  override def close(): Unit = {
    running.set(false)
    scheduler.shutdownNow()
    watcher.close()
    thread.join(5000)
  }
}
