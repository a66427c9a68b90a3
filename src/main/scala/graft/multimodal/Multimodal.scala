package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal column plumbing: media ride as opaque `binary` columns
  * with typed metadata; decode / feature-extraction runs as BATCHED
  * per-partition processing over a typed Dataset — the executor-side
  * shape a real decoder plugs into (one codec init per partition,
  * streaming iterator, no driver involvement, partition-parallel at
  * any scale).
  *
  * The image path is REAL: assets are genuine PNG files (encoded with
  * `javax.imageio` from a deterministic per-document pixel formula),
  * and every feature downstream is computed from pixels decoded back
  * through `ImageIO.read` — a full codec round-trip per asset. PNG is
  * lossless, so the oracle replays the generative formula in closed
  * form and gates the decoded-pixel-derived integers exactly; a
  * corrupted decode (wrong dims, wrong samples) flips the gate.
  * Only VIDEO decode (mm_frames) remains a deterministic stand-in —
  * the JVM ships no video codec.
  *
  * Fixture geometry: seed s (a 60-bit content hash) gives
  * `w = 1 + s%64`, `h = 1 + (s/64)%48`, and gray pixel
  * `g(x, y) = (s + y·w + x) mod 256` — chosen so per-image sums have
  * a CLOSED FORM (consecutive residues mod 256), keeping the DuckDB
  * oracle O(1) per document while the engine does real codec work.
  */
object Multimodal {

  // ImageIO's default on-disk stream cache would touch executor tmp
  // for every encode/decode; everything here is in-memory byte arrays
  ImageIO.setUseCache(false)

  /** Generation recipe for one asset (seed = 60-bit content hash). */
  final case class MmGen(doc_id: Long, source: String, seed: Long)

  /** An asset: opaque payload (real PNG bytes) + typed metadata. */
  final case class MmAsset(doc_id: Long, source: String, payload: Array[Byte])

  /** Features extracted from DECODED pixels (plus the container
    * byte size; `n_bytes` is codec-dependent and never oracle-gated).
    */
  final case class MmFeatures(
      doc_id: Long, source: String, n_bytes: Long, n_px: Long,
      width: Long, height: Long, gray_sum: Long, gray_min: Long,
      gray_max: Long, fp: Long)

  implicit val genEnc: Encoder[MmGen] = Encoders.product[MmGen]
  implicit val assetEnc: Encoder[MmAsset] = Encoders.product[MmAsset]
  implicit val featEnc: Encoder[MmFeatures] = Encoders.product[MmFeatures]

  private def dims(seed: Long): (Int, Int) =
    ((1L + seed % 64L).toInt, (1L + (seed / 64L) % 48L).toInt)

  /** Encode one REAL grayscale PNG from the deterministic formula.
    * `perturbed` adds +8 (mod 256) to every pixel with (x+y)%5==0 —
    * the re-compression-artifact stand-in the perceptual near-dup
    * fixture pairs against its original.
    */
  def encodePng(seed: Long, perturbed: Boolean = false): Array[Byte] = {
    val (w, h) = dims(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = if (perturbed && (x + y) % 5 == 0) 8L else 0L
        raster.setSample(x, y, 0, ((seed + y.toLong * w + x + d) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream(w * h / 2 + 128)
    require(ImageIO.write(img, "png", bos), "no PNG writer on this JVM")
    bos.toByteArray
  }

  /** Synthesize the PNG fixture: one batched per-partition encode. */
  def synthesize(gens: Dataset[MmGen], perturbed: Boolean = false): Dataset[MmAsset] =
    gens.mapPartitions(_.map(g =>
      MmAsset(g.doc_id, g.source, encodePng(g.seed, perturbed))))(assetEnc)

  /** Encode a REAL grayscale PNG of iid-NOISE pixels — each pixel is
    * the first md5 byte of "seed:x:y". The near-dup fixture uses this
    * family instead of the ramp: ramp images all cross their mean in
    * the same few patterns, so their aHash signatures collapse into a
    * handful of values (every image "near-dups" every other — the
    * same correlated-noise failure histogram hashes have on
    * shared-vocabulary corpora), while iid pixels give signatures the
    * bit entropy real photos have. The oracle replays md5 only at the
    * 64 sampled positions — O(1) per asset.
    */
  def encodeNoisePng(seed: Long, perturbed: Boolean = false): Array[Byte] = {
    val (w, h) = dims(seed)
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        md.reset()
        val b = md.digest(s"$seed:$x:$y".getBytes("UTF-8"))(0) & 0xff
        val d = if (perturbed && (x + y) % 5 == 0) 8 else 0
        raster.setSample(x, y, 0, (b + d) % 256)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream(w * h + 128)
    require(ImageIO.write(img, "png", bos), "no PNG writer on this JVM")
    bos.toByteArray
  }

  def synthesizeNoise(gens: Dataset[MmGen], perturbed: Boolean = false): Dataset[MmAsset] =
    gens.mapPartitions(_.map(g =>
      MmAsset(g.doc_id, g.source, encodeNoisePng(g.seed, perturbed))))(assetEnc)

  /** The 64 nearest-neighbor thumbnail samples of a decoded image. */
  private def thumb64(img: BufferedImage): Array[Long] = {
    val w = img.getWidth.toLong; val h = img.getHeight.toLong
    val raster = img.getRaster
    val samples = new Array[Long](64)
    var i = 0; var ty = 0
    while (ty < 8) {
      var tx = 0
      while (tx < 8) {
        samples(i) = raster.getSample(
          (tx * w / 8L).toInt, (ty * h / 8L).toInt, 0).toLong
        i += 1; tx += 1
      }
      ty += 1
    }
    samples
  }

  /** Perceptual signature: 64-bit AVERAGE HASH from the REAL decoded
    * raster — bit i set iff thumbnail sample i exceeds the floor-mean.
    * The standard aHash; hamming distance between signatures tracks
    * perceptual difference, which is what near-dup banding keys on.
    */
  final case class MmSig(doc_id: Long, source: String, sig: Long)

  implicit val sigEnc: Encoder[MmSig] = Encoders.product[MmSig]

  def ahashBatch(it: Iterator[MmAsset]): Iterator[MmSig] =
    it.map { a =>
      val img = ImageIO.read(new ByteArrayInputStream(a.payload))
      require(img != null, s"undecodable payload for doc ${a.doc_id}")
      val samples = thumb64(img)
      val mean = samples.sum / 64L
      var sig = 0L; var i = 0
      while (i < 64) {
        if (samples(i) > mean) sig |= (1L << i)
        i += 1
      }
      MmSig(a.doc_id, a.source, sig)
    }

  def ahash(assets: Dataset[MmAsset]): Dataset[MmSig] =
    assets.mapPartitions(ahashBatch)(sigEnc)

  /** REAL decode: `ImageIO.read` per asset, features from the decoded
    * raster — width/height from the codec, gray stats from a full
    * sample scan. Batched per-partition (streaming iterator, no
    * driver involvement); swap the PNG reader for JPEG/WebP and
    * nothing around it changes.
    */
  def decodeBatch(it: Iterator[MmAsset]): Iterator[MmFeatures] = {
    it.map { a =>
      val img = ImageIO.read(new ByteArrayInputStream(a.payload))
      require(img != null, s"undecodable payload for doc ${a.doc_id}")
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L; var mn = 255L; var mx = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0).toLong
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          x += 1
        }
        y += 1
      }
      MmFeatures(a.doc_id, a.source, a.payload.length.toLong,
        w.toLong * h, w.toLong, h.toLong, sum, mn, mx,
        fp = (sum * 1000003L + w.toLong * 1000L + h) % 1000000007L)
    }
  }

  def features(assets: Dataset[MmAsset]): Dataset[MmFeatures] =
    assets.mapPartitions(decodeBatch)(featEnc)

  /** Decoded dims + aspect-fit geometry + REAL 8×8 nearest-neighbor
    * thumbnail stats (the perceptual average-hash shape).
    */
  final case class MmResized(
      doc_id: Long, source: String, width: Long, height: Long,
      out_w: Long, out_h: Long, thumb_sum: Long, ahash_pop: Long)

  implicit val resizedEnc: Encoder[MmResized] = Encoders.product[MmResized]

  /** Aspect-fit into a `boxW`×`boxH` target, ALL-INTEGER rational
    * arithmetic (w·boxH ≤ h·boxW decides the binding axis; the free
    * axis floor-scales) — deterministic across engines, no float
    * rounding.
    */
  def fitBox(w: Long, h: Long, boxW: Long, boxH: Long): (Long, Long) = {
    val ww = math.max(1L, w); val hh = math.max(1L, h)
    if (ww * boxH <= hh * boxW) (ww * boxH / hh, boxH)
    else (boxW, hh * boxW / ww)
  }

  /** Decode (real), fit the box, then take a REAL 8×8 nearest-neighbor
    * thumbnail from the decoded raster — `thumb_sum` is the 64-sample
    * sum and `ahash_pop` the count of samples strictly above the
    * floor-mean (the average-hash popcount, an all-integer perceptual
    * fingerprint). Every output is decoded-pixel-derived.
    */
  def resizeBatch(it: Iterator[MmAsset], boxW: Long, boxH: Long): Iterator[MmResized] =
    it.map { a =>
      val img = ImageIO.read(new ByteArrayInputStream(a.payload))
      require(img != null, s"undecodable payload for doc ${a.doc_id}")
      val w = img.getWidth.toLong; val h = img.getHeight.toLong
      val (ow, oh) = fitBox(w, h, boxW, boxH)
      val samples = thumb64(img)
      val thumbSum = samples.sum
      val mean = thumbSum / 64L
      MmResized(a.doc_id, a.source, w, h, ow, oh, thumbSum,
        samples.count(_ > mean).toLong)
    }

  def resized(assets: Dataset[MmAsset], boxW: Long, boxH: Long): Dataset[MmResized] =
    assets.mapPartitions(it => resizeBatch(it, boxW, boxH))(resizedEnc)

  // ----------------------------------------------------------------
  // AUDIO modality — the same real-codec discipline as the image
  // path: assets are genuine RIFF/WAVE containers (PCM unsigned
  // 8-bit mono, encoded with `javax.sound.sampled` from a
  // deterministic per-document sample formula), and every feature is
  // computed from samples decoded back through
  // `AudioSystem.getAudioInputStream` — a full codec round-trip per
  // asset, batched per partition. PCM is lossless, so the oracle
  // replays the generative formula in closed form (consecutive
  // residues mod 256 — the image fixture's S(t) sums plus a
  // threshold-count C(t) for the silence ratio).
  //
  // Fixture: seed s gives `n = 1 + s%2048` samples at
  // `rate = 8000·(1 + (s/2048)%3)` Hz, sample
  // `a(i) = (s + i) mod 256` (unsigned amplitude). Swap the WAV
  // codec for MP3/FLAC decode and nothing around it changes.

  /** Audio features from DECODED samples: format fields from the
    * codec (sample rate, channel count), amplitude stats and the
    * silence count (samples below 16 of 255) from a full sample
    * scan; `n_bytes` is container-dependent, never oracle-gated.
    */
  final case class MmAudio(
      doc_id: Long, source: String, n_bytes: Long, sample_rate: Long,
      channels: Long, n_samples: Long, duration_ms: Long, amp_sum: Long,
      amp_min: Long, amp_max: Long, n_silent: Long)

  implicit val audioEnc: Encoder[MmAudio] = Encoders.product[MmAudio]

  private def audioParams(seed: Long): (Int, Float) =
    ((1L + seed % 2048L).toInt, (8000L * (1L + (seed / 2048L) % 3L)).toFloat)

  /** Encode one REAL WAV (RIFF container via javax.sound) from the
    * deterministic formula.
    */
  def encodeWav(seed: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val (n, rate) = audioParams(seed)
    val samples = new Array[Byte](n)
    var i = 0
    while (i < n) {
      samples(i) = ((seed + i) % 256L).toByte // unsigned PCM: 0..255
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      rate, 8, 1, 1, rate, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new ByteArrayOutputStream(n + 64)
    require(AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos) > 0,
      "no WAV writer on this JVM")
    bos.toByteArray
  }

  /** Synthesize the WAV fixture: one batched per-partition encode. */
  def synthesizeWav(gens: Dataset[MmGen]): Dataset[MmAsset] =
    gens.mapPartitions(_.map(g =>
      MmAsset(g.doc_id, g.source, encodeWav(g.seed))))(assetEnc)

  /** REAL decode: `AudioSystem.getAudioInputStream` per asset —
    * format fields from the parsed RIFF header, amplitude stats from
    * the decoded sample stream. Batched per partition (one codec
    * path per partition, streaming iterator, no driver involvement).
    */
  def audioBatch(it: Iterator[MmAsset]): Iterator[MmAudio] =
    it.map { a =>
      import javax.sound.sampled.AudioSystem
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"unexpected WAV shape for doc ${a.doc_id}")
      val n = ais.getFrameLength.toInt
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = ais.read(buf, off, n - off)
        require(r > 0, s"truncated WAV payload for doc ${a.doc_id}")
        off += r
      }
      var sum = 0L; var mn = 255L; var mx = 0L; var silent = 0L
      var i = 0
      while (i < n) {
        val v = (buf(i) & 0xff).toLong
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        if (v < 16L) silent += 1
        i += 1
      }
      val rate = fmt.getSampleRate.toLong
      MmAudio(a.doc_id, a.source, a.payload.length.toLong, rate,
        fmt.getChannels.toLong, n.toLong, n.toLong * 1000L / rate,
        sum, mn, mx, silent)
    }

  def audioFeatures(assets: Dataset[MmAsset]): Dataset[MmAudio] =
    assets.mapPartitions(audioBatch)(audioEnc)
}
