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

  private def fsOf(p: HPath): FileSystem = {
    val fs = p.getFileSystem(conf)
    // the lake keeps its own manifest-recorded stats — Hadoop's local
    // checksum sidecars (.crc) would pollute data dirs the manifest
    // enumerates by content
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    fs
  }

  def open(path: String): InputStream = {
    val p = new HPath(path)
    fsOf(p).open(p)
  }

  def create(path: String): OutputStream = {
    val p = new HPath(path)
    fsOf(p).create(p, true)
  }

  def sizeOf(path: String): Long = {
    val p = new HPath(path)
    fsOf(p).getFileStatus(p).getLen
  }
}
