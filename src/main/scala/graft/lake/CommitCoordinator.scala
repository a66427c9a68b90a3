package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** The commit coordinator SEAM: the two storage primitives the lake's
  * optimistic commit protocol actually needs, extracted so the
  * engine's OCC logic ([[LakeTable]]'s casLoop) is storage-agnostic.
  *
  * - `claim(path, body)` — publish `body` at `path` iff nothing is
  *   there; exactly one concurrent claimant wins. On a POSIX/local
  *   filesystem this is `CREATE_NEW`; on an object store it is a
  *   conditional PUT (`If-None-Match: *`) or a catalog/DynamoDB CAS
  *   entry when the store lacks one (the Delta-on-S3 LogStore shape).
  * - `advanceHead(meta, snap)` — monotonic head-HINT advance. The
  *   claim is the real commit; the pointer is derived, so a laggard
  *   loser must never move it backwards, and a stale pointer is
  *   harmless (readers walk forward from it).
  *
  * Everything else in the protocol — immutable staged data files,
  * uniquely-named part files, manifest-id = CAS key — is plain
  * write-once storage and needs no coordination.
  */
trait CommitCoordinator {

  /** Atomically publish `body` at `path` iff absent. True = won the
    * claim (the content is durably visible to readers on return);
    * false = another committer holds it.
    */
  def claim(path: Path, body: String): Boolean

  /** Monotonic head-pointer advance for `meta/_current`. */
  def advanceHead(meta: Path, snap: Int): Unit
}

/** Local/POSIX coordinator: `CREATE_NEW` IS the conditional put —
  * the filesystem arbitrates, no external service involved.
  */
object LocalFsCoordinator extends CommitCoordinator {

  override def claim(path: Path, body: String): Boolean =
    try {
      Files.writeString(path, body, StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  // the JVM lock covers in-process racers; cross-process, the
  // read-compare-move race is harmless because readers walk forward
  // from the pointer (an object-store port does a conditional put
  // keyed on the old value instead)
  private val lock = new Object

  override def advanceHead(meta: Path, snap: Int): Unit = lock.synchronized {
    val p = meta.resolve("_current")
    val cur = if (Files.exists(p)) Files.readString(p).trim.toInt else 0
    if (snap > cur) {
      val tmp = meta.resolve(s"_current.tmp$snap")
      Files.writeString(tmp, snap.toString)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

/** In-memory conditional-PUT coordinator: models an object store with
  * NO atomic create — claims arbitrate through an external CAS table
  * (here a `ConcurrentHashMap`, in production DynamoDB / a catalog
  * endpoint), and only the claim winner writes the object, with a
  * plain non-atomic write (the store needs no create-exclusivity
  * once arbitration has already decided). The head hint lives in the
  * same table (`putIfAbsent`/`replace` CAS loop) and writes through
  * to the pointer file so out-of-process readers still see it.
  */
final class MemoryCasCoordinator extends CommitCoordinator {

  private val claims = new ConcurrentHashMap[String, java.lang.Boolean]()
  private val heads = new ConcurrentHashMap[String, AtomicLong]()

  /** Claims arbitrated by this coordinator instance (spec surface). */
  def claimCount: Int = claims.size()

  override def claim(path: Path, body: String): Boolean = {
    // existing objects predate this coordinator (e.g. a table whose
    // early commits used the FS coordinator) — their keys are taken
    if (Files.exists(path)) return false
    if (claims.putIfAbsent(path.toString, java.lang.Boolean.TRUE) != null) {
      // unlike CREATE_NEW — where losing and the winner's manifest
      // existing are one atomic event — the claim here is decided
      // BEFORE the winner's object write lands. A loser returning in
      // that window would re-resolve the OLD head and spin its
      // retries unproductively, so wait (bounded) for the winner's
      // publish to become visible before reporting the loss.
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (!Files.exists(path) && System.nanoTime() < deadline)
        Thread.onSpinWait()
      return false
    }
    // winner publishes; a torn write here is the object store's
    // durability problem, not an arbitration one
    Files.writeString(path, body)
    true
  }

  override def advanceHead(meta: Path, snap: Int): Unit = {
    val h = heads.computeIfAbsent(meta.toString, _ => new AtomicLong(0L))
    var cur = h.get()
    while (snap > cur && !h.compareAndSet(cur, snap)) cur = h.get()
    if (snap >= h.get()) {
      val tmp = meta.resolve(s"_current.tmp$snap")
      Files.writeString(tmp, snap.toString)
      Files.move(tmp, meta.resolve("_current"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
