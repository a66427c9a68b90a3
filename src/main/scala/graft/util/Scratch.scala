package graft.util

import java.nio.file.{Files, Path, Paths}

/** Ephemeral scratch-space allocator for test/bench lake layouts,
  * staged streaming inputs, and streaming checkpoints.
  *
  * Local runs prefer a RAM-backed root (`/dev/shm`) when it is
  * writable AND has headroom (containers commonly mount a 64 MB shm,
  * where lake layouts would ENOSPC): these artifacts are transient by
  * construction (created, read back, deleted within one JVM), and on
  * a single node their cost is dominated by file create/rename
  * syscalls rather than by the engine's own work. This allocator
  * returns local filesystem paths; deploying the write path against
  * an object store means swapping it for a URI-returning strategy
  * (S3A/ABFS + zero-rename committers) — the operator plans built on
  * top are unchanged. Override with `GRAFT_SCRATCH=/path` to force a
  * specific root (e.g. real disk).
  */
object Scratch {

  /** Minimum usable space to prefer /dev/shm over java.io.tmpdir. */
  private val ShmMinBytes = 4L << 30

  private def usableBytes(p: Path): Long =
    try Files.getFileStore(p).getUsableSpace catch { case _: Exception => 0L }

  lazy val root: Path = {
    val base = sys.env.get("GRAFT_SCRATCH").map(Paths.get(_)).getOrElse {
      val shm = Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm) &&
        usableBytes(shm) >= ShmMinBytes) shm
      else Paths.get(System.getProperty("java.io.tmpdir"))
    }
    val r = base.resolve("graft-scratch")
    Files.createDirectories(r)
    System.err.println(s"[graft] scratch root: $r (usable ${usableBytes(r) >> 20} MB)")
    r
  }

  /** Fresh scratch dir, recursively deleted at JVM exit (layouts must
    * outlive their query's lazy read-back, so in-query deletion isn't
    * possible; the hook keeps repeated verify/bench runs from
    * stranding files).
    */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(root, prefix)
    sys.addShutdownHook(rmNow(p.toString))
    p.toString
  }

  /** Eager recursive delete for dirs whose consumers have finished. */
  def rmNow(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }
}
