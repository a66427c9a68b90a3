package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal column plumbing: media ride as opaque `binary` columns
  * with typed metadata; decode / feature-extraction runs as BATCHED
  * per-partition processing over a typed Dataset — the executor-side
  * shape a real decoder plugs into (one codec init per partition,
  * streaming iterator, no driver involvement, partition-parallel at
  * any scale).
  *
  * The decode step is a STUB: image/audio codecs are not available in
  * this environment, so `decodeBatch` computes a deterministic fake
  * (md5-derived dimensions) from the raw bytes. Swap its body for a
  * JPEG/ffmpeg call; everything around it — schema, encoders, batch
  * shape, partitioning — is real and tested.
  */
object Multimodal {

  /** An asset: opaque payload + typed metadata. */
  final case class MmAsset(doc_id: Long, source: String, payload: Array[Byte])

  /** Extracted features (all deterministic from payload bytes). */
  final case class MmFeatures(
      doc_id: Long, source: String, n_bytes: Long,
      width: Long, height: Long, frames: Long, fp: Long)

  implicit val assetEnc: Encoder[MmAsset] = Encoders.product[MmAsset]
  implicit val featEnc: Encoder[MmFeatures] = Encoders.product[MmFeatures]

  /** STUB decoder: one MessageDigest per partition (the "codec
    * init"), then a streaming map over the batch — the exact shape of
    * a real decode loop.
    */
  def decodeBatch(it: Iterator[MmAsset]): Iterator[MmFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    it.map { a =>
      md.reset()
      val hex = md.digest(a.payload).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val nBytes = a.payload.length.toLong
      MmFeatures(a.doc_id, a.source, nBytes,
        width = h % 640L,
        height = (h / 640L) % 480L,
        frames = nBytes % 30L,
        fp = h % 1000000007L)
    }
  }

  def features(assets: Dataset[MmAsset]): Dataset[MmFeatures] =
    assets.mapPartitions(decodeBatch)(featEnc)

  /** Features + aspect-fit resize target. */
  final case class MmResized(
      doc_id: Long, source: String, width: Long, height: Long,
      out_w: Long, out_h: Long)

  implicit val resizedEnc: Encoder[MmResized] = Encoders.product[MmResized]

  /** Aspect-fit resize into a `boxW`×`boxH` target, ALL-INTEGER
    * rational arithmetic (w·boxH ≤ h·boxW decides the binding axis;
    * the free axis floor-scales) — deterministic across engines, no
    * float rounding. Zero dims clamp to 1 (the stub's h%640 can be 0;
    * a real decoder never emits it). This is the preprocessing step a
    * vision pipeline runs between decode and feature extraction; a
    * real implementation swaps the arithmetic for the actual pixel
    * resample with identical geometry.
    */
  def resizeBatch(it: Iterator[MmFeatures], boxW: Long, boxH: Long): Iterator[MmResized] =
    it.map { f =>
      val w = math.max(1L, f.width)
      val h = math.max(1L, f.height)
      val (ow, oh) =
        if (w * boxH <= h * boxW) (w * boxH / h, boxH)
        else (boxW, h * boxW / w)
      MmResized(f.doc_id, f.source, w, h, ow, oh)
    }

  def resized(assets: Dataset[MmAsset], boxW: Long, boxH: Long): Dataset[MmResized] =
    features(assets).mapPartitions(it => resizeBatch(it, boxW, boxH))(resizedEnc)
}
