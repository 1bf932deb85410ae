package graft.streaming

import java.nio.file.{FileSystems, Files, Path, Paths, StandardWatchEventKinds, WatchKey}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Event-driven close detection: the engine's analogue of the reference's
  * inotify `IN_CLOSE_WRITE` patch (close-write-flush.patch:20-101 — the
  * fluent-bit side watches each container log file and force-flushes its
  * tag within 30 s of the container exiting).
  *
  * The JVM's WatchService exposes create/modify/delete, not close-write —
  * but in the kubelet layout the DELETE of a `<ns>_<pod>_<uid>/<container>/
  * *.log` file (log rotation away, or the pod dir being reaped after exit)
  * is the durable "this stream is done" signal. The watcher tree-registers
  * the pods root (new pod/container dirs register as they appear) and
  * translates each log-file delete into one [[CloseWriteDetector.PodActivity]]
  * MARKER (`closed = true`), which [[CloseWriteDetector.closedStreams]]
  * turns into a [[CloseWriteDetector.PodClosed]] in the SAME trigger — a
  * quiet-but-closed stream finalizes immediately instead of waiting out the
  * inactivity timeout (the timeout stays as the fallback for streams whose
  * deletes the watcher never sees, e.g. after a watcher restart).
  *
  * Driver-side and O(live directories): one watch registration per pod/
  * container dir, one tiny callback per delete — never data-plane. Scale
  * note: this watches the NODE-LOCAL log tree (the reference's fluent-bit
  * runs per node as a DaemonSet); a 1000-node cluster runs 1000 tail
  * ingests, each with its own watcher on its own /var/log/pods.
  */
final class FileCloseWatcher(podsRoot: String,
    onClose: CloseWriteDetector.PodActivity => Unit,
    cluster: String) extends AutoCloseable {

  private val watcher = FileSystems.getDefault.newWatchService()
  private val running = new AtomicBoolean(true)
  private val rootPath = Paths.get(podsRoot)

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
    dir.register(watcher, StandardWatchEventKinds.ENTRY_CREATE,
      StandardWatchEventKinds.ENTRY_DELETE)
    // register existing children too (tree walk is cheap: pods × containers)
    Files.list(dir).iterator().asScala.filter(Files.isDirectory(_))
      .foreach(register)
  }

  register(rootPath)

  private def loop(): Unit = {
    while (running.get()) {
      val key: WatchKey =
        try watcher.take()
        catch { case _: java.nio.file.ClosedWatchServiceException => return }
      val dir = key.watchable().asInstanceOf[Path]
      key.pollEvents().asScala.foreach { ev =>
        val name = ev.context().toString
        val full = dir.resolve(name)
        ev.kind() match {
          case StandardWatchEventKinds.ENTRY_CREATE =>
            // a new pod or container dir: start watching it
            if (Files.isDirectory(full))
              try register(full)
              catch { case _: java.io.IOException => () } // raced its delete
          case StandardWatchEventKinds.ENTRY_DELETE if name.endsWith(".log") =>
            // pods/<ns>_<pod>_<uid>/<container>/<n>.log
            val container = dir.getFileName.toString
            Option(dir.getParent).map(_.getFileName.toString)
              .flatMap(podOf).foreach { case (ns, pod) =>
                onClose(CloseWriteDetector.PodActivity(
                  cluster, ns, pod, container,
                  time_ns = System.currentTimeMillis() * 1000000L,
                  closed = true))
              }
          case _ => ()
        }
      }
      key.reset()
    }
  }

  private val thread = new Thread(() => loop(), s"graft-close-watcher-$podsRoot")
  thread.setDaemon(true)
  thread.start()

  override def close(): Unit = {
    running.set(false)
    watcher.close()
    thread.join(5000)
  }
}
