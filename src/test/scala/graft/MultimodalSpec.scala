package graft

import graft.llm.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = MultimodalOps.asMedia(
    Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text"), "text", "doc_id")

  test("media columns are opaque binary + typed metadata") {
    val m = media
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = MultimodalOps.decodeImageMeta(m)
    val r = meta.filter($"media_id" === 1L).head()
    assert(r.getAs[Int]("n_bytes") == 11)
    assert(r.getAs[Int]("width") == 16 + 11 % 240)
    assert(r.getAs[Int]("channels") == 3)
  }

  test("frame sampling explodes 1->N with ordered frame indexes") {
    val frames = MultimodalOps.sampleFrames(media, n = 4)
    assert(frames.count() == 8)
    val idx = frames.filter($"media_id" === 1L).select("frame_idx")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(idx == Seq(0, 1, 2, 3))
    assert(frames.schema("frame").dataType.typeName == "binary")
  }

  test("decodeImageMeta parses real PNG IHDR and JPEG SOF headers") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    // minimal-but-real PNG: signature + IHDR(640x480, bit depth 8, RGBA)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    // minimal-but-real JPEG: SOI, APP0 (16 bytes), DQT-ish skip segment,
    // then SOF0 with 480x640 x 3 components
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        new Array[Byte](14) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(480) ++ be16(640) ++ Array[Byte](3) ++
        new Array[Byte](9)
    // progressive JPEG variant: SOF2 instead of SOF0
    val jpegP = jpeg.clone(); jpegP(21) = 0xc2.toByte
    // GIF89a logical screen descriptor: 320x200 little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00) ++ new Array[Byte](4)
    val df = spark.createDataFrame(Seq(
      (1L, png), (2L, jpeg), (3L, jpegP), (5L, gif),
      (4L, "not an image".getBytes("UTF-8"))))
      .toDF("media_id", "media")
    val out = MultimodalOps.decodeImageMeta(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    assert(out(1L) == ((640, 480, 4, "png")))
    assert(out(2L) == ((640, 480, 3, "jpeg")))
    assert(out(3L) == ((640, 480, 3, "jpeg-progressive")))
    assert(out(5L) == ((320, 200, 3, "gif")))
    assert(out(4L)._4 == "stub") // non-image bytes keep the stub fallback
  }

  test("wavMeta parses a real RIFF/fmt/data header") {
    val payload = Array.fill[Byte](32000)(7)
    val wav = MultimodalOps.wavBytes(payload, channels = 2,
      sampleRate = 16000, bitsPerSample = 16)
    // 2 ch × 16 bit × 16 kHz = 64000 B/s → 32000 bytes = 500 ms
    assert(MultimodalOps.wavMeta(wav).contains((2, 16000, 16, 500L)))
    // extra chunk before fmt must be walked over, not tripped on
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val shuffled = wav.take(12) ++ listChunk ++ wav.drop(12)
    assert(MultimodalOps.wavMeta(shuffled).contains((2, 16000, 16, 500L)))
    assert(MultimodalOps.wavMeta("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(MultimodalOps.wavMeta("not audio at all".getBytes("US-ASCII")).isEmpty)
    // corrupt chunk size must terminate, not throw
    val corrupt = wav.clone()
    corrupt(40) = -1; corrupt(41) = -1; corrupt(42) = -1; corrupt(43) = -1
    MultimodalOps.wavMeta(corrupt) // no exception is the assertion
  }

  test("mp4Meta walks ftyp/moov to the mvhd timescale and duration") {
    val mp4 = MultimodalOps.mp4Bytes(Array.fill[Byte](100)(1),
      timescale = 600, durationUnits = 1500)
    assert(MultimodalOps.mp4Meta(mp4).contains((600L, 1500L, 2500L)))
    assert(MultimodalOps.mp4Meta("RIFF".getBytes("US-ASCII")).isEmpty)
    // a WAV must not parse as MP4 and vice versa
    val wav = MultimodalOps.wavBytes(Array.fill[Byte](64)(1), 1, 8000, 16)
    assert(MultimodalOps.mp4Meta(wav).isEmpty)
    assert(MultimodalOps.wavMeta(mp4).isEmpty)
  }

  test("decodeAvMeta round-trips synthAv and reports unknown for neither") {
    import spark.implicits._
    val df = Seq((0L, "x" * 64000), (1L, "y" * 100), (7L, "")).toDF("doc_id", "text")
    val out = MultimodalOps.decodeAvMeta(MultimodalOps.synthAv(df, "text", "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r0 = out(0L) // even: wav, channels 1, rate 8000 → 16000 B/s
    assert(r0.getString(2) == "wav" && r0.getInt(3) == 1 &&
      r0.getInt(4) == 8000 && r0.getLong(6) == 4000L)
    val r1 = out(1L) // odd: mp4, timescale 1001, duration 100·25
    assert(r1.getString(2) == "mp4" && r1.isNullAt(3) &&
      r1.getLong(6) == 2500L * 1000 / 1001)
    assert(out(7L).getString(2) == "mp4") // empty payload still parses
    val plain = Seq((9L, "just text".getBytes("UTF-8"))).toDF("media_id", "media")
    val u = MultimodalOps.decodeAvMeta(plain).head()
    assert(u.getString(2) == "unknown" && u.isNullAt(6))
  }

  test("feature extraction emits fixed-dim float vectors") {
    val f = MultimodalOps.extractFeatures(media)
    val v = f.head().getSeq[Float](1)
    assert(v.length == 16)
    assert(MultimodalOps.extractFeatures(media).head().getSeq[Float](1) == v) // deterministic
  }

  // ---- REAL pixel decode (JDK ImageIO) -----------------------------------

  test("synthPng -> decodeImagePixels round-trips the pixel formula losslessly") {
    val ids = Seq(0L, 3L, 64L, 131L).toDF("doc_id")
    val got = MultimodalOps.decodeImagePixels(
      MultimodalOps.synthPng(ids, "doc_id", 24, 16, groups = 64))
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent Scala replay of the documented closed form
    for (id <- Seq(0L, 3L, 64L, 131L)) {
      val base = id % 64; val v = id / 64
      var sr = 0L; var ck = 0L
      for (y <- 0 until 16; x <- 0 until 24) {
        var rr = (base * 31 + x * 7 + y * 13) % 256
        if (v > 0 && x == v % 24 && y == (v / 24) % 16) rr = (rr + 128) % 256
        val gg = (base * 17 + x * 11 + y * 5) % 256
        val bb = (base * 23 + x * 3 + y * 19) % 256
        sr += rr
        ck += (3 * rr + 5 * gg + 7 * bb) * ((x + y.toLong * 24) % 1000 + 1)
      }
      val r = got(id)
      assert(r.getAs[String]("decoder") == "imageio")
      assert((r.getAs[Int]("width"), r.getAs[Int]("height")) == ((24, 16)))
      assert(r.getAs[Long]("sum_r") == sr, s"sum_r for $id")
      assert(r.getAs[Long]("px_checksum") == ck, s"checksum for $id")
    }
  }

  test("decodeImagePixels decodes a REAL JPEG (lossy: dims exact, stats close)") {
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    assert(jpeg(0) == 0xff.toByte && jpeg(1) == 0xd8.toByte) // real JFIF bytes
    val df = Seq((7L, jpeg)).toDF("media_id", "media")
    val r = MultimodalOps.decodeImagePixels(df).head()
    assert(r.getAs[String]("decoder") == "imageio")
    assert((r.getAs[Int]("width"), r.getAs[Int]("height")) == ((32, 24)))
    // lossy codec: channel means within a few units of the source means
    val nPx = 32 * 24
    val srcMeanR = (0 until 32).map(_ * 8).sum * 24.0 / nPx
    assert(math.abs(r.getAs[Long]("sum_r").toDouble / nPx - srcMeanR) < 6.0)
    assert(math.abs(r.getAs[Long]("sum_b").toDouble / nPx - 128.0) < 6.0)
  }

  test("undecodable bytes yield decoder=none with null stats") {
    val df = Seq((1L, "not an image".getBytes("UTF-8"))).toDF("media_id", "media")
    val r = MultimodalOps.decodeImagePixels(df).head()
    assert(r.getAs[String]("decoder") == "none")
    assert(r.isNullAt(r.fieldIndex("sum_r")))
  }

  test("aHash64: identical images collide, one-pixel variants stay near, banding is complete <= 3") {
    // 20 docs over 4 bases: ids sharing id % 4 are <= 1 perturbed pixel apart
    val ids = (0L until 20L).toDF("doc_id")
    val media = MultimodalOps.synthPng(ids, "doc_id", 24, 16, groups = 4)
    val hashed = MultimodalOps.aHash64(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed.size == 20)
    // brute-force ground truth at maxHamming=3
    val brute = (for {
      a <- hashed.keys; b <- hashed.keys if a < b
      d = java.lang.Long.bitCount(hashed(a) ^ hashed(b)) if d <= 3
    } yield (a, b, d)).toSet
    val banded = MultimodalOps.imageNearDupPairs(
      MultimodalOps.aHash64(media), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute) // pigeonhole completeness at <= 3
    assert(brute.exists(_._3 == 0), "same-base variants should collide exactly")
  }

  test("imageNearDupPairs: null hashes pair with nothing; duplicated input rows don't duplicate pairs") {
    import spark.implicits._
    // two ids share hash 5L, one is 1 bit away, two ids have NULL hashes
    // (undecodable images), and the (1L, 5L) row appears TWICE
    val rows = Seq(
      (1L, Some(5L)), (1L, Some(5L)), (2L, Some(5L)), (3L, Some(4L)),
      (8L, None), (9L, None))
    val hashed = rows.toDF("media_id", "ahash")
    val got = MultimodalOps.imageNearDupPairs(hashed, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // null-hash ids (8, 9) appear in NO pair — not even with each other —
    // and (1,2) appears exactly once despite the duplicated input row
    assert(got == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("imageNearDupPairs: one media_id under two hashes never merges distinct-hash groups") {
    import spark.implicits._
    // media 1 re-ingested with a changed decode carries BOTH h1=0 and
    // h2=32 (hamming(h1,h2)=1); media 2 only h1, media 3 only h2. A
    // rep-keyed formulation merges the two groups through their shared
    // min-id (1) — emitting a bogus (2,3,hamming=0) and dropping the
    // legitimate cross pairs (code-review find, r15)
    val hashed = Seq((1L, 0L), (2L, 0L), (1L, 32L), (3L, 32L))
      .toDF("media_id", "ahash")
    val got = MultimodalOps.imageNearDupPairs(hashed, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // within h1: (1,2,0); within h2: (1,3,0); cross h1×h2 at hamming 1:
    // (1,2) via (2@h1, 1@h2), (1,3) via (1@h1, 3@h2), (2,3); never (x,x)
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0),
      (1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("imageDupClusters: identical-hash pre-collapse yields the same components as raw pairs") {
    val ids = (0L until 40L).toDF("doc_id")
    val media = MultimodalOps.synthPng(ids, "doc_id", 24, 16, groups = 8)
    val hashed = MultimodalOps.aHash64(media)
    val got = MultimodalOps.imageDupClusters(hashed, maxHamming = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: union-find over the RAW (uncollapsed) pair set — the
    // collapse is an optimization, never a semantic change
    val pairs = MultimodalOps.imageNearDupPairs(hashed, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(got == nodes.map(n => n -> find(n)).toMap)
  }

  test("decodeAudioPcm: hand-computed stats incl. negative samples") {
    // samples 1000, -2000, 3000, -4000 as 16-bit LE PCM — the negative
    // values exercise the sign extension the ASCII-payload oracle can't
    val samples = Array(1000, -2000, 3000, -4000)
    val payload = samples.flatMap(s =>
      Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val wav = MultimodalOps.wavBytes(payload, channels = 1,
      sampleRate = 8000, bitsPerSample = 16)
    val media = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "media")
    val got = MultimodalOps.decodeAudioPcm(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val w = got(1L)
    assert(w.getString(1) == "pcm16")
    assert(w.getInt(2) == 4)           // n_samples
    assert(w.getInt(3) == 4000)        // peak_abs
    assert(w.getLong(4) == 10000L)     // sum_abs
    // 1e6 + 4e6 + 9e6 + 16e6
    assert(w.getLong(5) == 30000000L)  // sum_sq
    // mean = -500; centered signs +,-,+,- -> 3 crossings
    assert(w.getInt(6) == 3)           // dc_crossings
    assert(w.getInt(7) == 0)           // n_frames (< 64 samples)
    assert(w.isNullAt(8))              // max_frame_energy: no full frame
    assert(got(2L).getString(1) == "unknown" && got(2L).isNullAt(2))
  }

  test("decodeAudioPcm frame energies: loudest 64-sample frame wins") {
    // 128 samples: quiet frame (all 10) then loud frame (all 100)
    val samples = Array.fill(64)(10) ++ Array.fill(64)(100)
    val payload = samples.flatMap(s =>
      Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val wav = MultimodalOps.wavBytes(payload, channels = 2,
      sampleRate = 16000, bitsPerSample = 16)
    val r = MultimodalOps.decodeAudioPcm(
      Seq((7L, wav)).toDF("media_id", "media")).head()
    assert(r.getInt(2) == 128 && r.getInt(7) == 2)
    assert(r.getLong(8) == 64L * 100 * 100)
    // all-positive signal: no DC crossings only if constant — here the
    // mean sits between the frames, so exactly one crossing
    assert(r.getInt(6) == 1)
  }

  private def expectedFrameStats(id: Long, f: Int, w: Int, h: Int) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (id * 31 + f * 29 + x * 7 + y * 13) % 256
      val g = (id * 17 + f * 23 + x * 11 + y * 5) % 256
      val b = (id * 23 + f * 41 + x * 3 + y * 19) % 256
      sr += r; sg += g; sb += b
      ck += (3 * r + 5 * g + 7 * b) * ((x + y.toLong * w) % 1000 + 1)
    }
    (sr, sg, sb, ck)
  }

  test("synthAvi -> decodeVideoFrames round-trips both codecs losslessly") {
    val ids = Seq(0L, 3L, 10L, 41L).toDF("doc_id") // even=dib, odd=png
    val out = MultimodalOps.decodeVideoFrames(
        MultimodalOps.synthAvi(ids, "doc_id", 24, 16, nFrames = 3))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    assert(out.size == 12)
    for (id <- Seq(0L, 3L, 10L, 41L); f <- 0 until 3) {
      val r = out((id, f))
      val (sr, sg, sb, ck) = expectedFrameStats(id, f, 24, 16)
      assert(r.getLong(2) == f * 40L) // 40000 us/frame
      assert(r.getInt(3) == 24 && r.getInt(4) == 16)
      assert((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) ==
        ((sr, sg, sb, ck)), s"id=$id f=$f")
      assert(r.getString(9) == (if (id % 2 == 0) "dib" else "imageio"))
    }
  }

  test("decodeVideoFrames stride decodes only every k-th frame") {
    val ids = Seq(2L).toDF("doc_id")
    val out = MultimodalOps.decodeVideoFrames(
        MultimodalOps.synthAvi(ids, "doc_id", 24, 16, nFrames = 10),
        stride = 4)
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(out == Seq(0, 4, 8))
  }

  test("MJPG frames (real lossy JPEG) decode through the same walk") {
    val avi = MultimodalOps.aviBytes(5L, 24, 16, nFrames = 2,
      usPerFrame = 33333, codec = "jpeg")
    // container parses with the MJPG handler
    val Some((w, h, total, us, handler)) = MultimodalOps.aviMeta(avi)
    assert((w, h, total, us, handler) == ((24, 16, 2, 33333, "MJPG")))
    val rows = MultimodalOps.decodeVideoFrames(
      Seq((5L, avi)).toDF("media_id", "media")).collect()
    assert(rows.length == 2 && rows.forall(_.getString(9) == "imageio"))
    // lossy codec: stats are near, not equal — channel means within 16/255
    for (r <- rows) {
      val (sr, sg, sb, _) = expectedFrameStats(5L, r.getInt(1), 24, 16)
      val n = 24 * 16
      assert(math.abs(r.getLong(5) - sr) <= 16L * n, "r channel drifted")
      assert(math.abs(r.getLong(6) - sg) <= 16L * n, "g channel drifted")
      assert(math.abs(r.getLong(7) - sb) <= 16L * n, "b channel drifted")
    }
  }

  test("sampleFrames returns REAL evenly-spaced chunk payloads for AVI") {
    val ids = Seq(4L).toDF("doc_id")
    val media = MultimodalOps.synthAvi(ids, "doc_id", 24, 16, nFrames = 8)
    val frames = MultimodalOps.sampleFrames(media, n = 4).collect()
      .sortBy(_.getInt(1))
    assert(frames.length == 4)
    // evenly spaced over 8 frames: source indexes 0,2,4,6 -> ts 0,80,160,240
    assert(frames.map(_.getLong(2)).toSeq == Seq(0L, 80L, 160L, 240L))
    // payload IS the raw DIB frame (stride 72 * 16 rows), not a 16-byte slice
    assert(frames.forall(_.getAs[Array[Byte]](3).length == 72 * 16))
    // decodeAvMeta reports the avi kind + duration from the frame period
    val meta = MultimodalOps.decodeAvMeta(media).head()
    assert(meta.getString(2) == "avi" && meta.getLong(6) == 8L * 40)
  }
}
