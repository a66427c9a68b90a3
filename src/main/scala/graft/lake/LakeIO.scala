package graft.lake

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Filesystem seam for the avro data plane: all container read/write
  * IO resolves through Hadoop's `FileSystem` — exactly like the
  * parquet path — so a manifest path may be plain, `file:`-schemed,
  * or any other registered scheme (`hdfs:`, `s3a:`, …) and the right
  * store answers. No `java.io.File` anywhere in the plane.
  */
private[graft] object LakeIO {

  private lazy val conf = new Configuration()

  // PRIVATE FileSystem instances (FileSystem.newInstance bypasses the
  // JVM-global cache): the checksum flags below must never leak onto
  // the cached instance Spark's committers / checkpoint managers /
  // event-log writers share — disabling CRC process-wide would make
  // a bit-rotted checkpoint read as valid garbage. One instance per
  // (scheme, authority), created once, reused for the plane's IO.
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  private def fsOf(p: HPath): FileSystem = {
    val uri = p.toUri
    val key = s"${uri.getScheme}//${uri.getAuthority}"
    instances.computeIfAbsent(key, _ => {
      // newInstance handles a scheme-less URI by falling back to the
      // configured default filesystem, like FileSystem.get
      val fs = FileSystem.newInstance(uri, conf)
      // the lake keeps its own manifest-recorded stats — Hadoop's
      // local checksum sidecars (.crc) would pollute data dirs the
      // manifest enumerates by content
      fs.setWriteChecksum(false)
      fs.setVerifyChecksum(false)
      fs
    })
  }

  /** Resolve a manifest-recorded path against the filesystem. Older
    * manifests recorded avro paths through `file.toURI` (percent-
    * encoded: a space became `%20`); newer ones record the verbatim
    * path. The literal form wins; the URI-decoded form is the
    * fallback for old-format entries.
    */
  private def resolve(path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    val fs = fsOf(p)
    if (fs.exists(p) || !path.contains("%")) (fs, p)
    else {
      val decoded = new HPath(java.net.URI.create(path).getPath)
      if (fs.exists(decoded)) (fs, decoded) else (fs, p)
    }
  }

  def open(path: String): InputStream = {
    val (fs, p) = resolve(path)
    fs.open(p)
  }

  def create(path: String): OutputStream = {
    val p = new HPath(path)
    fsOf(p).create(p, true)
  }

  def sizeOf(path: String): Long = {
    val (fs, p) = resolve(path)
    fs.getFileStatus(p).getLen
  }
}
