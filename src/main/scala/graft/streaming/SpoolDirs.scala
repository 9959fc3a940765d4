package graft.streaming

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Lifecycle registry for the parquet spool directories
  * [[WindowFnOnClose]] materializes (window-aggregate spools and durable
  * join spools). A spool must outlive the frame that reads it — the read
  * is lazy — so creation sites can't delete eagerly; but a long-lived
  * session running many spool-shaped queries must not leak disk either.
  *
  * Contract: every spool dir is registered here at creation. A consumer
  * that knows the frame's lifetime ([[graft.sql.Pipeline]]: the batch
  * frame is fully drained into the sink, the streaming read-backs are
  * drained when every query of the run terminates) wraps the producing
  * call in [[track]] and calls [[release]] when done. Anything never
  * released (direct API callers) is reclaimed by the JVM shutdown hook.
  */
object SpoolDirs {

  private val all = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private val scopeLocal = new ThreadLocal[scala.collection.mutable.Buffer[Path]]

  Runtime.getRuntime.addShutdownHook(new Thread(() => releaseAll(), "graft-spool-cleanup"))

  /** Create + register a spool dir (called by the spool machinery). */
  private[streaming] def create(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    all.add(d)
    Option(scopeLocal.get()).foreach(_ += d)
    d
  }

  /** Run `body`, returning its result plus every spool dir it created on
    * THIS thread (spooling is synchronous driver-side work). Nests: an
    * inner track also reports into the enclosing scope.
    */
  def track[T](body: => T): (T, Seq[Path]) = {
    val buf = scala.collection.mutable.Buffer.empty[Path]
    val prev = scopeLocal.get()
    scopeLocal.set(buf)
    try {
      val r = body
      Option(prev).foreach(_ ++= buf)
      (r, buf.toSeq)
    } finally {
      if (prev == null) scopeLocal.remove() else scopeLocal.set(prev)
    }
  }

  /** Delete the given spool dirs. Idempotent: a dir already released (or
    * never registered) is skipped, so nested consumers can both release.
    */
  def release(dirs: Seq[Path]): Unit = dirs.foreach { d =>
    if (all.remove(d)) deleteRecursively(d)
  }

  def releaseAll(): Unit = release(all.asScala.toSeq)

  /** Spool dirs currently registered and not yet released (specs). */
  def live: Set[Path] = all.asScala.toSet

  private def deleteRecursively(d: Path): Unit =
    if (Files.exists(d)) {
      val s = Files.walk(d)
      val paths = try s.iterator().asScala.toSeq finally s.close()
      paths.reverse.foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => })
    }
}
