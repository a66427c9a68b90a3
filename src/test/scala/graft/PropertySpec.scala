package graft

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup}

/** Randomized model tests (seeded, deterministic): operator
  * implementations vs brute-force models on random small inputs —
  * catches tie-breaking / empty-group / null edge semantics that
  * fixed fixtures miss.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private val keys = Seq("k1", "k2", "k3")

  test("AvroPlane round-trips adversarial values exactly (10 seeded trials)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("t", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("b", BooleanType, nullable = true)))
    val nasty = Seq("", "a\nb", "x\u0000y", "过程😀", "ünïcødé",
      "\"quoted\"", " lead/trail ")
    for (trial <- 0 until 10) {
      val rnd = new scala.util.Random(4200 + trial)
      def optNull[A](v: A): Any = if (rnd.nextInt(5) == 0) null else v
      val rows = (0 until 50).map { i =>
        Row(i.toLong,
          optNull(rnd.nextLong()),
          optNull(rnd.nextDouble() * 1e12 - 5e11),
          optNull(nasty(rnd.nextInt(nasty.length)) + rnd.nextInt(10)),
          optNull(new java.sql.Timestamp(rnd.nextLong() % 4102444800000L)),
          optNull(rnd.nextBoolean()))
      }
      val df = s.createDataFrame(
        new java.util.ArrayList[Row](rows.asJava), schema).repartition(3)
      val root = graft.util.Scratch.dir(s"graft_avro_prop_$trial")
      graft.lake.LakeTable.appendAvro(s, root, df, Seq("id"))
      val back = graft.lake.LakeTable.read(s, root)
      assert(back.count() === 50)
      assert(back.exceptAll(df).count() === 0 && df.exceptAll(back).count() === 0,
        s"trial $trial round-trip drift")
      graft.util.Scratch.rmNow(root)
    }
  }

  test("leftAsOf == brute-force latest-at-or-before model (20 seeded trials)") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(1000 + trial)
      val lRows = Seq.fill(1 + rnd.nextInt(12))((keys(rnd.nextInt(3)), rnd.nextInt(20).toLong))
      val rRows = Seq.fill(rnd.nextInt(12))((keys(rnd.nextInt(3)), rnd.nextInt(20).toLong, rnd.nextInt(100)))
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rRows.toDF("k", "t", "p")
      val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", Seq("p"))
        .select("lid", "p").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      // model: per left row, right rows same key with t <= left.t;
      // max t wins, ties broken by LARGEST p (tie-break asc carry).
      val expect = lRows.zipWithIndex.map { case ((k, t), i) =>
        val cands = rRows.filter(r => r._1 == k && r._2 <= t)
        val best = if (cands.isEmpty) None else {
          val mt = cands.map(_._2).max
          Some(cands.filter(_._2 == mt).map(_._3).max)
        }
        i.toLong -> best
      }.toMap
      assert(got === expect, s"trial $trial: left=$lRows right=$rRows")
    }
  }

  test("blockId == floor((rank-1)/maxSize) model (20 seeded trials)") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(2000 + trial)
      val rows = Seq.fill(1 + rnd.nextInt(20))((keys(rnd.nextInt(3)), rnd.nextInt(30).toLong)).distinct
      val maxSize = 1 + rnd.nextInt(5)
      val df = rows.toDF("k", "t")
      val got = df.withColumn("b",
        graft.writer.BlockWriter.blockId("k", Seq(col("t")), maxSize))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(_._2).zipWithIndex.map { case ((k, t), i) => (k, t) -> (i / maxSize).toLong }
      }
      assert(got === expect, s"trial $trial: rows=$rows maxSize=$maxSize")
    }
  }

  test("native graft_simhash == composed simhash (20 seeded trials)") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(4000 + trial)
      // UNMASKED longs: negative hashes (bit 63 set) are exactly where
      // arithmetic-shift semantics would diverge from the native
      // expression's logical shift — keep them in the test domain.
      val hs = Seq.fill(rnd.nextInt(30))(rnd.nextLong())
      val bits = 1 + rnd.nextInt(48)
      val df = Seq(Tuple1(hs)).toDF("whs")
      val row = df.select(
        Dedup.simhash(col("whs"), bits).as("nat"),
        Dedup.simhashComposed(col("whs"), bits).as("comp")).head()
      assert(row.getLong(0) === row.getLong(1), s"trial $trial: bits=$bits hs=$hs")
    }
  }

  test("minhashSig == affine-rehash model over hashed grams (20 seeded trials)") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(8000 + trial)
      val whs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() & ((1L << 60) - 1))
      val i = rnd.nextInt(12)
      val got = Seq(Tuple1(whs)).toDF("whs")
        .select(Dedup.minhashSig(col("whs"), i).as("m")).head().getLong(0)
      val expect = whs.map(h =>
        (Dedup.mhA(i) * (h % Dedup.MH_P) + Dedup.mhB(i)) % Dedup.MH_P).min
      assert(got === expect, s"trial $trial i=$i")
    }
  }

  test("zInterleave == bit-interleave model (20 seeded trials)") {
    val s = spark
    import s.implicits._
    def model(a: Long, b: Long): Long =
      (0 until 8).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    val rnd = new scala.util.Random(5000)
    val pairs = Seq.fill(20)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.queries.Advanced.zInterleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- pairs)
      assert(got((a, b)) === model(a, b), s"a=$a b=$b")
  }

  test("native graft_d2i == composed zip_with/aggregate L2² (20 seeded trials)") {
    val s = spark
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(7000 + trial)
      val n = 1 + rnd.nextInt(64)
      val a = Seq.fill(n)(rnd.nextInt(2000000).toLong - 1000000L)
      val b = Seq.fill(n)(rnd.nextInt(2000000).toLong - 1000000L)
      val row = Seq((a, b)).toDF("a", "b").select(
        call_function("graft_d2i", col("a"), col("b")).as("nat"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("comp")).head()
      assert(row.getLong(0) === row.getLong(1), s"trial $trial")
    }
  }

  test("topRunLength == max word multiplicity, incl. a long repetitive doc") {
    val s = spark
    import s.implicits._
    val alphabet = Seq("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(6000)
    // 20 random docs + 1 long repetitive doc (the quadratic-blowup
    // case the linear run-length form exists for).
    val docs = Seq.fill(20)(Seq.fill(1 + rnd.nextInt(30))(alphabet(rnd.nextInt(5)))) :+
      Seq.fill(5000)(alphabet(rnd.nextInt(2)))
    val got = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "ws")
      .select(col("id"), graft.queries.LlmPipeline.topRunLength(col("ws")).as("top"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((d, i) <- docs.zipWithIndex) {
      val expect = d.groupBy(identity).values.map(_.size).max.toLong
      assert(got(i.toLong) === expect, s"doc $i")
    }
  }

  test("fitBox: aspect-fit geometry bounds and ratio (100 seeded trials)") {
    import graft.multimodal.Multimodal
    val rnd = new scala.util.Random(9000)
    for (_ <- 0 until 100) {
      val w = rnd.nextInt(641).toLong; val h = rnd.nextInt(481).toLong
      val (ow, oh) = Multimodal.fitBox(w, h, 224L, 224L)
      assert(ow <= 224L && oh <= 224L, s"exceeds box: ($w,$h)->($ow,$oh)")
      assert(ow == 224L || oh == 224L, s"not fit to box: ($w,$h)->($ow,$oh)")
      assert(ow >= 1L && oh >= 1L, s"degenerate: ($w,$h)->($ow,$oh)")
      // aspect preserved within floor rounding: ow/oh ≈ w/h
      val ww = math.max(1L, w); val hh = math.max(1L, h)
      assert(math.abs(ow * hh - oh * ww) <= math.max(ww, hh),
        s"aspect drifted: ($w,$h)->($ow,$oh)")
    }
  }

  test("PNG codec round-trip: decoded dims, sums, min/max, thumbnail match the generative formula (200 seeded trials)") {
    import graft.multimodal.Multimodal
    val rnd = new scala.util.Random(9100)
    for (trial <- 0 until 200) {
      val seed = math.abs(rnd.nextLong()) % (1L << 60)
      val png = Multimodal.encodePng(seed)
      // a REAL PNG container (magic bytes), decoded with ImageIO
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
        png(3) == 'G', s"trial $trial: not a PNG container")
      val f = Multimodal.decodeBatch(
        Iterator(Multimodal.MmAsset(trial.toLong, "s", png))).next()
      val w = 1L + seed % 64L; val h = 1L + (seed / 64L) % 48L
      assert(f.width === w && f.height === h, s"trial $trial dims")
      assert(f.n_px === w * h)
      // lossless: decoded samples are the consecutive residues mod 256
      val m = seed % 256L; val n = w * h
      def S(t: Long): Long = (t / 256L) * 32640L + (t % 256L) * (t % 256L - 1L) / 2L
      assert(f.gray_sum === S(m + n) - S(m), s"trial $trial gray_sum")
      assert(f.gray_min === (if (m + n <= 256L) m else 0L), s"trial $trial min")
      assert(f.gray_max === (if (m + n <= 256L) m + n - 1L else 255L), s"trial $trial max")
      // thumbnail: 64 nearest-neighbor samples from the decoded raster
      val r = Multimodal.resizeBatch(
        Iterator(Multimodal.MmAsset(trial.toLong, "s", png)), 224L, 224L).next()
      val samples = for (ty <- 0 until 8; tx <- 0 until 8)
        yield (seed + (ty * h / 8L) * w + (tx * w / 8L)) % 256L
      assert(r.thumb_sum === samples.sum, s"trial $trial thumb_sum")
      assert(r.ahash_pop === samples.count(_ > samples.sum / 64L).toLong,
        s"trial $trial ahash_pop")
    }
  }

  test("WAV codec round-trip: RIFF container, parsed rate, decoded amplitude stats and silence count match the generative formula (200 seeded trials)") {
    import graft.multimodal.Multimodal
    val rnd = new scala.util.Random(9300)
    for (trial <- 0 until 200) {
      val seed = math.abs(rnd.nextLong()) % (1L << 60)
      val wav = Multimodal.encodeWav(seed)
      // a REAL RIFF/WAVE container, decoded with javax.sound
      assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' &&
        wav(3) == 'F' && wav(8) == 'W' && wav(9) == 'A',
        s"trial $trial: not a RIFF/WAVE container")
      val f = Multimodal.audioBatch(
        Iterator(Multimodal.MmAsset(trial.toLong, "s", wav))).next()
      val n = 1L + seed % 2048L
      val rate = 8000L * (1L + (seed / 2048L) % 3L)
      assert(f.sample_rate === rate, s"trial $trial rate")
      assert(f.channels === 1L && f.n_samples === n, s"trial $trial frames")
      assert(f.duration_ms === n * 1000L / rate, s"trial $trial duration")
      // lossless PCM: decoded samples are the consecutive residues
      val m = seed % 256L
      def S(t: Long): Long = (t / 256L) * 32640L + (t % 256L) * (t % 256L - 1L) / 2L
      def C(t: Long): Long = (t / 256L) * 16L + math.min(t % 256L, 16L)
      assert(f.amp_sum === S(m + n) - S(m), s"trial $trial amp_sum")
      assert(f.amp_min === (if (m + n <= 256L) m else 0L), s"trial $trial min")
      assert(f.amp_max === (if (m + n <= 256L) m + n - 1L else 255L), s"trial $trial max")
      assert(f.n_silent === C(m + n) - C(m), s"trial $trial silence")
    }
  }

  test("noise-PNG aHash: round-trip matches md5 formula; variants land near, unrelated land far (60 seeded trials)") {
    import graft.multimodal.Multimodal
    val md = java.security.MessageDigest.getInstance("MD5")
    def formulaSig(seed: Long, perturbed: Boolean): Long = {
      val w = 1L + seed % 64L; val h = 1L + (seed / 64L) % 48L
      val samples = for (ty <- 0 until 8; tx <- 0 until 8) yield {
        val sx = tx * w / 8L; val sy = ty * h / 8L
        md.reset()
        val b = (md.digest(s"$seed:$sx:$sy".getBytes("UTF-8"))(0) & 0xff).toLong
        (b + (if (perturbed && (sx + sy) % 5 == 0) 8L else 0L)) % 256L
      }
      val mean = samples.sum / 64L
      samples.zipWithIndex.foldLeft(0L) { case (sig, (v, i)) =>
        if (v > mean) sig | (1L << i) else sig
      }
    }
    def sigOf(seed: Long, perturbed: Boolean): Long =
      Multimodal.ahashBatch(Iterator(Multimodal.MmAsset(0L, "s",
        Multimodal.encodeNoisePng(seed, perturbed)))).next().sig
    val rnd = new scala.util.Random(9200)
    val sigs = (0 until 60).map { trial =>
      var seed = math.abs(rnd.nextLong()) % (1L << 60)
      // the fixture excludes tiny images — do the same here
      while ((1L + seed % 64L) * (1L + (seed / 64L) % 48L) < 64L)
        seed = math.abs(rnd.nextLong()) % (1L << 60)
      val orig = sigOf(seed, perturbed = false)
      assert(orig === formulaSig(seed, perturbed = false), s"trial $trial orig")
      val vr = sigOf(seed, perturbed = true)
      assert(vr === formulaSig(seed, perturbed = true), s"trial $trial variant")
      // the planted variant is perceptually NEAR its original
      assert(java.lang.Long.bitCount(orig ^ vr) <= 16,
        s"trial $trial: variant hamming ${java.lang.Long.bitCount(orig ^ vr)}")
      orig
    }
    // unrelated noise images are FAR apart on average — the signature
    // space has real entropy (ramp images collapse; noise must not)
    val hams = for (i <- sigs.indices; j <- (i + 1) until sigs.size)
      yield java.lang.Long.bitCount(sigs(i) ^ sigs(j))
    assert(hams.sum.toDouble / hams.size > 24.0,
      s"unrelated mean hamming ${hams.sum.toDouble / hams.size} — sig space collapsed")
  }

  test("jaccardBp == integer model on random string sets (20 seeded trials)") {
    val s = spark
    import s.implicits._
    val alphabet = Seq("a", "b", "c", "d", "e", "f")
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(3000 + trial)
      val xa = Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(6))).distinct
      val xb = Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(6))).distinct
      val df = Seq((xa, xb)).toDF("a", "b")
      val got = df.select(Dedup.jaccardBp(col("a"), col("b")).as("j")).head().getLong(0)
      val inter = xa.toSet.intersect(xb.toSet).size.toLong
      val uni = xa.toSet.union(xb.toSet).size.toLong
      assert(got === inter * 10000L / uni, s"trial $trial: a=$xa b=$xb")
    }
  }
}
