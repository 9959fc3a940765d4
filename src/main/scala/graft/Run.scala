package graft

import graft.sql.Pipeline

/** CLI entry point — the analogue of the reference's `arroyo run <query.sql>`
  * (crates/arroyo/src/main.rs:82-185): execute a SQL pipeline script.
  *
  * Usage: runMain graft.Run <script.sql> [--streaming]
  * A trailing bare SELECT prints its result; INSERT INTO sinks write per
  * their connector DDL.
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Run <script.sql> [--streaming]")
    val script = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    val streaming = args.contains("--streaming")
    val spark = GraftSession.get("graft-run")
    val result = new Pipeline(spark, streaming).run(script)
    result.foreach(_.show(100, truncate = false))
    spark.stop()
  }
}
