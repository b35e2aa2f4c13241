package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` columns next to typed metadata, processed per-partition
  * in batches (the Scala analogue of `mapInPandas`: one iterator of rows per
  * partition, shared decoder state per partition, explicit output schema).
  *
  * IMAGE pixel decode is REAL: `javax.imageio` ships with the JDK (and
  * runs headless), so [[decodeImagePixels]]/[[aHash64]] decode actual
  * PNG/JPEG/GIF/BMP bytes with no external dependency. AUDIO sample decode
  * is REAL for 16-bit PCM WAV ([[decodeAudioPcm]] — PCM needs no codec).
  * Container METADATA decode (PNG/JPEG/GIF headers, WAV RIFF, MP4 boxes)
  * is dependency-free byte parsing. VIDEO frame decode is REAL for AVI
  * with raw-DIB or image-per-frame (PNG/MJPG) codecs
  * ([[decodeVideoFrames]] — RIFF chunk walk + byte-math/ImageIO, no codec
  * jar). Only inter-frame-compressed codecs (H.264 & co., which don't
  * ship in the JDK) stay out of scope; blobs in those codecs report
  * metadata only.
  */
object MultimodalOps {

  // ImageIO's default stream cache is FILE-backed: every encode/decode of
  // an in-memory blob round-trips a temp file. In-memory caching turns the
  // per-image cost from ~1 ms to ~50 µs on the bench's 24x16 tiles.
  javax.imageio.ImageIO.setUseCache(false)

  /** ImageIO read with the in-memory cache posture pinned per executor
    * (the object initializer runs once per JVM classloader). */
  private def imageRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'

  /** Per-partition decode state: `ImageIO.read` pays a provider lookup and
    * reader construction PER CALL — on 24x16 tiles that overhead dwarfs the
    * actual inflate. One PNG reader per partition, reset via setInput, is
    * the "shared decoder state per partition" shape from the header
    * scaladoc made concrete; non-PNG blobs take the generic path. */
  private final class PartitionImageReader {
    private val pngReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    def read(bytes: Array[Byte]): java.awt.image.BufferedImage =
      if (bytes == null || bytes.isEmpty) null
      else if (isPng(bytes)) {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try { pngReader.setInput(iis, true, true); pngReader.read(0) }
        catch { case _: Exception => null }
        finally iis.close()
      } else imageRead(bytes)
  }

  /** Minimal REAL PNG encoder: signature, IHDR (8-bit RGB), one IDAT of
    * filter-0 scanlines deflated at BEST_SPEED, IEND — a valid PNG any
    * decoder reads (the specs assert ImageIO round-trips it pixel-exact).
    * Exists because ImageIO's PNG writer costs ~1 ms per call in metadata
    * and param plumbing, turning the synthetic-corpus bench into an
    * encoder benchmark. */
  private[llm] def pngEncode(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val ro = y * (1 + 3 * w)
      raw(ro) = 0 // filter type None
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        raw(ro + 1 + 3 * x) = ((p >> 16) & 0xff).toByte
        raw(ro + 2 + 3 * x) = ((p >> 8) & 0xff).toByte
        raw(ro + 3 + 3 * x) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val idat = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val bos = new java.io.ByteArrayOutputStream(idat.size + 64)
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      bos.write(be32b(data.length.toLong))
      val tb = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      bos.write(tb); bos.write(data); bos.write(be32b(crc.getValue))
    }
    chunk("IHDR", be32b(w.toLong) ++ be32b(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)) // bit depth 8, color type 2 (truecolor RGB)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.empty[Byte])
    bos.toByteArray
  }

  /** Make an opaque media column from any string column (test stand-in for
    * reading real image/audio bytes). */
  def asMedia(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("media_type"))

  private val metaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** PNG dimensions from the IHDR chunk — pure byte parsing, no codec.
    * Layout: 8-byte signature, 4-byte chunk length, "IHDR", then width and
    * height as big-endian u32 at offsets 16/20; bit depth at 24, color
    * type at 25 (channels: 0 gray=1, 2 RGB=3, 3 palette=1, 4 gray+a=2,
    * 6 RGBA=4). */
  private[llm] def pngMeta(b: Array[Byte]): Option[(Int, Int, Int, String)] =
    if (b.length >= 26 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      def be32(o: Int) = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      val channels = (b(25) & 0xff) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 3
      }
      Some((be32(16), be32(20), channels, "png"))
    } else None

  /** GIF dimensions from the logical screen descriptor: "GIF87a"/"GIF89a"
    * signature, then width and height as little-endian u16 at bytes 6-9.
    * Palette-indexed color decodes to RGB → 3 channels. */
  private[llm] def gifMeta(b: Array[Byte]): Option[(Int, Int, Int, String)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
      val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      Some((w, h, 3, "gif"))
    } else None

  /** JPEG dimensions from the first SOF frame header — walks the marker
    * segments (each FF xx followed by a big-endian length, standalone
    * RST/TEM/SOI markers excepted) until a start-of-frame marker
    * (C0-CF minus C4 DHT / C8 JPG / CC DAC); the SOF payload carries
    * precision(1) height(2) width(2) components(1). Handles both baseline
    * (SOF0) and progressive (SOF2). */
  private[llm] def jpegMeta(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) { i = j + 1 } // standalone
      else if (marker == 0xd9) return None // EOI before any SOF
      else {
        if (j + 2 >= b.length) return None
        val len = ((b(j + 1) & 0xff) << 8) | (b(j + 2) & 0xff)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (j + 8 >= b.length) return None
          val h = ((b(j + 4) & 0xff) << 8) | (b(j + 5) & 0xff)
          val w = ((b(j + 6) & 0xff) << 8) | (b(j + 7) & 0xff)
          val nc = b(j + 8) & 0xff
          return Some((w, h, nc,
            if (marker == 0xc2) "jpeg-progressive" else "jpeg"))
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** Decode each media blob to image metadata.
    *
    * REAL header decode for PNG (IHDR), JPEG (SOF0/SOF2 marker scan), and
    * GIF (logical screen descriptor) — all dependency-free byte parsing.
    * Blobs that are none of these fall
    * back to the loudly-marked STUB (deterministic fake dimensions from the
    * byte length): full decoders for other formats don't ship in this
    * container. The mapPartitions shape (one decoder per partition,
    * iterator-in/iterator-out batches) is the real production plumbing.
    */
  def decodeImageMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      // per-partition decoder state would be initialized here (real codec)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0 else bytes.length
        val parsed =
          if (n == 0) None
          else pngMeta(bytes).orElse(jpegMeta(bytes)).orElse(gifMeta(bytes))
        parsed match {
          case Some((w, h, c, fmt)) => Row(id, n, w, h, c, fmt)
          case None =>
            // STUB decode: deterministic fake dimensions from byte length
            val width = 16 + n % 240
            val height = 16 + (n * 7) % 240
            Row(id, n, width, height, 3, "stub")
        }
      }
    }(Encoders.row(metaSchema))

  // ---- REAL pixel decode (JDK ImageIO — javax.imageio ships with the
  // JDK and runs headless, so PNG/JPEG/GIF/BMP pixel decode needs no
  // external codec at all; only VIDEO codecs remain stubbed) ------------

  /** Deterministic synthetic PNG per row — a REAL, losslessly-decodable
    * image whose pixels are a closed-form function of (id, x, y), so a
    * SQL oracle can recompute any pixel statistic WITHOUT decoding:
    * base = id % groups (groups=0 → base=id, no variants),
    * r = (base*31 + x*7 + y*13) % 256, g = (base*17 + x*11 + y*5) % 256,
    * b = (base*23 + x*3 + y*19) % 256, and a variant v = id / groups
    * perturbs the single pixel (v % w, (v/w) % h) by +128 on r — images
    * of one base differ in ≤ 1 px (near-dups for perceptual hashing).
    * Encoding goes through ImageIO's real PNG writer; the BYTES may vary
    * by JVM, the PIXELS cannot (PNG is lossless). */
  def synthPng(df: DataFrame, idCol: String, w: Int, h: Int,
      groups: Int = 0): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val base = if (groups > 0) id % groups else id
          val v = if (groups > 0) id / groups else 0L
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var rr = ((base * 31 + x * 7 + y * 13) % 256).toInt
              val gg = ((base * 17 + x * 11 + y * 5) % 256).toInt
              val bb = ((base * 23 + x * 3 + y * 19) % 256).toInt
              if (v > 0 && x == (v % w).toInt && y == ((v / w) % h).toInt)
                rr = (rr + 128) % 256
              px(y * w + x) = (rr << 16) | (gg << 8) | bb
              x += 1
            }
            y += 1
          }
          Row(id, pngEncode(px, w, h), "image/png")
        }
      }(Encoders.row(StructType(Seq(
        StructField("media_id", LongType),
        StructField("media", BinaryType),
        StructField("media_type", StringType)))))

  private val pixelSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("px_checksum", LongType),
    StructField("decoder", StringType)))

  /** REAL pixel decode: ImageIO reads the blob (PNG/JPEG/GIF/BMP — every
    * JDK-bundled reader), and integer pixel statistics come off the raw
    * RGB values: channel sums plus a position-weighted checksum
    * Σ (3r+5g+7b)·((x + y·w) % 1000 + 1) — all exact integer math, so a
    * lossless source makes the whole encode→decode→aggregate loop
    * hash-checkable by an oracle that recomputes the formula. Undecodable
    * blobs yield a `decoder = "none"` row with null stats (the posture of
    * decodeImageMeta's stub fallback, made explicit). One decoder per
    * partition, iterator-in/iterator-out — the mapInPandas shape. */
  def decodeImagePixels(media: DataFrame): DataFrame =
    media.select(col("media_id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        val decoder = new PartitionImageReader
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = decoder.read(bytes)
          if (img == null) Row(id, null, null, null, null, null, null, null, "none")
          else {
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w) // ONE bulk convert
            var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              val rr = (p >> 16) & 0xff; val gg = (p >> 8) & 0xff; val bb = p & 0xff
              sr += rr; sg += gg; sb += bb
              ck += (3L * rr + 5L * gg + 7L * bb) * (i % 1000 + 1)
              i += 1
            }
            Row(id, w, h, img.getColorModel.getNumComponents, sr, sg, sb, ck,
              "imageio")
          }
        }
      }(Encoders.row(pixelSchema))

  /** 64-bit average-hash (aHash) from REAL decoded pixels: the image pools
    * into an 8×8 grid of integer gray sums (gray = r+g+b — monotone, no
    * division, so the oracle replays it exactly); bit k is set iff
    * 64·blockSum(k) > totalSum (strict — the all-equal image hashes to 0).
    * Width and height must be multiples of 8 so block pooling is exact
    * integer arithmetic. Per-row map, shuffle-free. */
  def aHash64(media: DataFrame): DataFrame =
    media.select(col("media_id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        val decoder = new PartitionImageReader
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = decoder.read(bytes)
          if (img == null) Iterator.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            require(w % 8 == 0 && h % 8 == 0,
              s"aHash64 needs dimensions divisible by 8, got ${w}x$h")
            val bw = w / 8; val bh = h / 8
            val px = img.getRGB(0, 0, w, h, null, 0, w) // ONE bulk convert
            val blocks = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              val rowBase = (y / bh) * 8
              var x = 0
              while (x < w) {
                val p = px(y * w + x)
                val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                blocks(rowBase + x / bw) += gray
                total += gray
                x += 1
              }
              y += 1
            }
            var hash = 0L; var k = 0
            while (k < 64) {
              if (64L * blocks(k) > total) hash |= 1L << k
              k += 1
            }
            Iterator.single(Row(id, hash))
          }
        }
      }(Encoders.row(StructType(Seq(
        StructField("media_id", LongType), StructField("ahash", LongType)))))

  /** Perceptual near-dup image pairs: banded LSH over the 64-bit aHash —
    * 4 bands of 16 bits bucket the corpus; candidate pairs verify with an
    * exact popcount on the XOR. COMPLETE (recall 1.0) for
    * `maxHamming` ≤ 3: 3 differing bits cannot touch all 4 bands, so some
    * band collides (pigeonhole); beyond 3 the banding is probabilistic,
    * like every LSH. Never all-pairs: the join is a hash equi-join on
    * (band, bucket). */
  def imageNearDupPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    // Identical-hash PRE-COLLAPSE (r14; the embedNearDupLsh idiom): band
    // only one representative per DISTINCT aHash. Without it a
    // duplicate-heavy corpus floods every band bucket with |copies| rows
    // and the equi-join materializes |copies|² candidates per bucket —
    // the 100x replica (500k images, ~8k per visual group) spilled
    // ~1.6e10 join rows and filled the disk. Candidacy and hamming depend
    // only on the HASH, so banding reps and expanding the id groups
    // afterward is output-identical; compute drops to Θ(distinct hashes)
    // + Θ(output), and the output itself is the op's contract (all
    // qualifying pairs — inherently quadratic in copies; use
    // imageDupClusters as the scale path, which feeds this op reps only).
    // Membership stays as ROWS, never a collect_list per hash (r15: a viral
    // image with 10^7 copies would otherwise materialize a ~100 MB array in
    // ONE aggregation row before the explode — an executor-OOM skew risk the
    // row-level join form doesn't have). Null hashes are dropped up front
    // (the pre-r14 equi-join on a null bucket matched nothing, so pairs
    // among undecodable images were never emitted) and duplicated
    // (media_id, ahash) input rows are collapsed so the expansion joins stay
    // duplicate-free (the pre-r14 form deduped the final pairs).
    val mem = hashed.filter(col("ahash").isNotNull)
      .select(col("ahash"), col("media_id")).distinct()
    // group identity is the HASH itself, end to end. (An earlier form keyed
    // membership by the group's min-id representative, but a media_id that
    // appears under TWO different hashes can be the min of both groups —
    // rep-keyed joins then merged distinct-hash groups and rep_a < rep_b
    // dedup dropped their legitimate cross pairs. Hash keys cannot
    // collide with themselves.) If one media_id really does carry several
    // hashes (re-ingest with a changed decode), it is simply a member of
    // several groups, and a pair may be witnessed once per qualifying
    // hash pair.
    val hashes = mem.select(col("ahash")).distinct()
    val bands = (0 until 4).map(b => ((b * 16), b)).map { case (shift, b) =>
      hashes.select(col("ahash"),
        lit(b).as("band"),
        shiftrightunsigned(col("ahash"), shift).bitwiseAND(lit(0xffffL)).as("bucket"))
    }.reduce(_ unionByName _)
    val a = bands.select(col("ahash").as("h_a"), col("band"), col("bucket"))
    val b = bands.select(col("ahash").as("h_b"), col("band"), col("bucket"))
    val hashPairs = a.join(b, Seq("band", "bucket"))
      .filter(col("h_a") < col("h_b"))
      .select(col("h_a"), col("h_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    // cross-group expansion via two hash joins on the hash: each join row
    // carries ONE member id, so no row grows with group size
    val cross = hashPairs
      .join(mem.select(col("ahash").as("h_a"), col("media_id").as("__ia")), "h_a")
      .join(mem.select(col("ahash").as("h_b"), col("media_id").as("__ib")), "h_b")
      .filter(col("__ia") =!= col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("hamming"))
    // same-hash pairs: hamming 0, always qualifying — a hash-keyed
    // self-join with id_a < id_b enumerates each unordered pair once
    val selfA = mem.select(col("ahash"), col("media_id").as("id_a"))
    val selfB = mem.select(col("ahash"), col("media_id").as("id_b"))
    val self = selfA.join(selfB, "ahash")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        lit(0).cast(IntegerType).as("hamming"))
    // distinct over the OUTPUT rows: two media sharing two or more hashes
    // (both re-ingested with a changed decode) would otherwise witness the
    // same (id_a, id_b, hamming) row once per shared hash / hash pair. A
    // no-op shuffle-wise for the normal one-hash-per-id corpus, and the
    // output is this demo op's contract size anyway (clusters is the
    // scale path).
    cross.unionByName(self).distinct()
  }

  /** SCALE path for image dedup — the composed pipeline a training corpus
    * actually runs (the [[graft.llm.DedupOps.dedupNear]] shape, on
    * perceptual hashes): collapse IDENTICAL aHashes to one representative
    * first, so the quadratic within-group pair blowup of
    * [[imageNearDupPairs]] never materializes (a 10× replicated corpus
    * multiplies that op's output 100×; this one's edges grow linearly),
    * band only the representatives, and fold member edges + rep-level near
    * pairs through connected components. Returns (media_id, cluster) with
    * cluster = min member id; keep `media_id == cluster` to dedup. */
  def imageDupClusters(hashed: DataFrame, maxHamming: Int): DataFrame = {
    // NOT persisted (r16 measured): although `hashed` feeds several
    // subtrees, clustersLogD checkpoints the union in its first job, so the
    // decode subtree executes once either way — adding persist here
    // measured SLOWER (5.2 → 6.6 s warm at sf0.1), cache-write overhead
    // for no avoided work.
    val reps = hashed.groupBy("ahash").agg(min("media_id").as("rep"))
    val memberEdges = hashed.join(reps, "ahash")
      .filter(col("media_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("media_id").as("id_b"))
    val nearPairs = imageNearDupPairs(
      reps.select(col("rep").as("media_id"), col("ahash")), maxHamming)
      .select("id_a", "id_b")
    DedupOps.clustersLogD(memberEdges.unionByName(nearPairs))
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_ts_ms", LongType),
    StructField("frame", BinaryType)))

  /** Sample `n` frames per media blob. For an AVI blob the frames are
    * REAL: `n` evenly-spaced "##db"/"##dc" chunk payloads located by the
    * movi chunk walk (undecoded frames are seeked past, never read) with
    * timestamps from the container's frame period. For any other blob the
    * frames are byte slices — plumbing-only fallback, same 1→N explosion,
    * schema, and ordering. */
  def sampleFrames(media: DataFrame, n: Int, frameMs: Long = 40L): DataFrame =
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else aviMeta(bytes) match {
          case Some((_, _, total, usPerFrame, _)) if total > 0 =>
            val want = (0 until math.min(n, total))
              .map(i => i.toLong * total / math.min(n, total)).toSet
            aviFrameChunks(bytes)
              .filter { case (idx, _, _, _) => want(idx.toLong) }
              .zipWithIndex
              .map { case ((idx, _, off, len), outIdx) =>
                Row(id, outIdx, idx.toLong * usPerFrame / 1000L,
                  java.util.Arrays.copyOfRange(bytes, off, off + len))
              }
          case _ => (0 until n).iterator.map { i =>
            val start = (bytes.length.toLong * i / n).toInt
            val end = math.min(bytes.length, start + 16)
            Row(id, i, i * frameMs, java.util.Arrays.copyOfRange(bytes, start, end))
          }
        }
      }
    }(Encoders.row(frameSchema))

  /** WAV audio metadata from the RIFF container — pure byte parsing, no
    * codec. Layout: "RIFF" u32le(riffSize) "WAVE", then a chunk walk
    * (4-byte id, u32le size, payload, odd sizes padded to even). The
    * "fmt " chunk carries u16le audioFormat, u16le channels, u32le
    * sampleRate, u32le byteRate, u16le blockAlign, u16le bitsPerSample;
    * the "data" chunk's size over byteRate gives the duration.
    * Returns (channels, sampleRate, bitsPerSample, durationMs). */
  private[graft] def wavMeta(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataSize = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length)
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22), le32(i + 16)))
      else if (id == "data") dataSize = math.min(size, b.length - i - 8L)
      // chunks pad to even; clamp so a corrupt size can't overflow the index
      i = math.min(b.length.toLong, i + 8L + size + (size & 1L)).toInt
    }
    fmt.collect { case (ch, rate, bits, byteRate)
        if dataSize >= 0 && byteRate > 0 =>
      (ch, rate, bits, dataSize * 1000L / byteRate)
    }
  }

  /** Locate the PCM "data" chunk: returns (dataOffset, dataLen) when the
    * blob is a RIFF/WAVE whose fmt chunk says audioFormat=1 (uncompressed
    * PCM) at 16 bits — the one WAV layout that needs NO codec: samples are
    * the chunk's bytes, two at a time, little-endian signed. */
  private[graft] def wavPcm16Data(b: Array[Byte]): Option[(Int, Int)] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    var i = 12
    var pcm16 = false
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (!pcm16 || data.isEmpty)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length)
        pcm16 = le16(i + 8) == 1 && le16(i + 22) == 16
      else if (id == "data")
        data = Some((i + 8, math.min(size, b.length - i - 8L).toInt))
      i = math.min(b.length.toLong, i + 8L + size + (size & 1L)).toInt
    }
    if (pcm16) data else None
  }

  private val pcmSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_samples", IntegerType),
    StructField("peak_abs", IntegerType),
    StructField("sum_abs", LongType),
    StructField("sum_sq", LongType),
    StructField("dc_crossings", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("max_frame_energy", LongType)))

  /** REAL audio sample decode — PCM needs no codec, so this closes the
    * "audio samples are stubbed" gap the same way ImageIO closed images:
    * the RIFF walk finds the 16-bit PCM data chunk and the samples ARE the
    * bytes (little-endian signed pairs, channels interleaved; stats pool
    * all channels). Integer-exact per-blob features, every one replayable
    * analytically by a SQL oracle when the payload is known:
    *  - `n_samples`, `peak_abs`, `sum_abs`, `sum_sq` — amplitude stats;
    *  - `dc_crossings` — zero crossings AFTER DC-offset removal, computed
    *    in exact integer math as sign changes of `n·s[j] − Σs` (comparing
    *    signs, never the product — the product overflows a long on
    *    minutes-long audio);
    *  - `n_frames` / `max_frame_energy` — Σs² per non-overlapping
    *    64-sample frame (full frames only), the loudest frame's energy.
    * Non-PCM blobs (MP4, compressed WAV) report kind "unknown" with null
    * stats — same posture as [[decodeAvMeta]]: parsed or absent, no fakes.
    * mapPartitions keeps decode zero-copy per partition; nothing shuffles
    * until the caller aggregates. */
  def decodeAudioPcm(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        wavPcm16Data(bytes) match {
          case Some((off, len)) =>
            val n = len / 2
            def sample(j: Int): Int =
              ((bytes(off + 2 * j + 1) << 8) | (bytes(off + 2 * j) & 0xff))
                .toShort.toInt
            var sum = 0L; var sumAbs = 0L; var sumSq = 0L; var peak = 0
            var j = 0
            while (j < n) {
              val s = sample(j)
              sum += s; sumAbs += math.abs(s).toLong
              sumSq += s.toLong * s; peak = math.max(peak, math.abs(s))
              j += 1
            }
            var cross = 0
            j = 0
            while (j + 1 < n) {
              val a = java.lang.Long.signum(n.toLong * sample(j) - sum)
              val b2 = java.lang.Long.signum(n.toLong * sample(j + 1) - sum)
              if (a * b2 < 0) cross += 1
              j += 1
            }
            val nFrames = n / 64
            var maxE: Option[Long] = None
            var k = 0
            while (k < nFrames) {
              var e = 0L; var m = 0
              while (m < 64) {
                val s = sample(64 * k + m).toLong; e += s * s; m += 1
              }
              maxE = Some(math.max(maxE.getOrElse(Long.MinValue), e))
              k += 1
            }
            Row(id, "pcm16", n, peak, sumAbs, sumSq, cross, nFrames,
              maxE.orNull)
          case None =>
            Row(id, "unknown", null, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(pcmSchema))

  /** MP4/QuickTime movie metadata from the `moov/mvhd` box — a top-level
    * box walk (u32be size, 4-byte type; size 1 = u64be largesize follows,
    * size 0 = to end-of-file), then moov's children to `mvhd`, whose full
    * box payload is version(1) flags(3) then v0: ctime(4) mtime(4)
    * timescale(4) duration(4), or v1: ctime(8) mtime(8) timescale(4)
    * duration(8). Returns (timescale, durationUnits, durationMs). */
  private[graft] def mp4Meta(b: Array[Byte]): Option[(Long, Long, Long)] = {
    def be32(o: Int): Long = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] { // (type, payloadStart, payloadEnd)
        private var i = lo
        def hasNext: Boolean = i + 8 <= hi
        def next(): (String, Int, Int) = {
          val size0 = be32(i)
          val tpe = new String(b, i + 4, 4, "US-ASCII")
          val (payload, end) =
            if (size0 == 1 && i + 16 <= hi) (i + 16L, i + be64(i + 8))
            else if (size0 == 0) (i + 8L, hi.toLong)
            else (i + 8L, i + size0)
          val clamped = math.min(end, hi.toLong).toInt
          val out = (tpe, payload.toInt, clamped)
          i = math.max(clamped, i + 8) // malformed size: still advance
          out
        }
      }
    if (b.length < 16) return None
    // an MP4 leads with ftyp/styp (ISO 14496-12 §4.3); require it so
    // arbitrary binaries don't parse accidentally
    val first = boxes(0, b.length).take(1).toList
    if (!first.exists { case (t, _, _) => t == "ftyp" || t == "styp" })
      return None
    boxes(0, b.length).collectFirst { case ("moov", s, e) =>
      boxes(s, e).collectFirst { case ("mvhd", ms, me) if me - ms >= 20 =>
        val version = b(ms) & 0xff
        val (timescale, duration) =
          if (version == 1 && me - ms >= 32) (be32(ms + 20), be64(ms + 24))
          else (be32(ms + 12), be32(ms + 16))
        (timescale, duration,
          if (timescale > 0) duration * 1000L / timescale else 0L)
      }
    }.flatten
  }

  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32b(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def be32b(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
    (v >> 8).toByte, v.toByte)

  /** Minimal valid WAV file around `payload` PCM bytes (test/synthesis). */
  private[graft] def wavBytes(payload: Array[Byte], channels: Int,
      sampleRate: Int, bitsPerSample: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    "RIFF".getBytes("US-ASCII") ++ le32b(36L + payload.length) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le32b(16) ++ le16b(1) ++
      le16b(channels) ++ le32b(sampleRate) ++ le32b(byteRate) ++
      le16b(blockAlign) ++ le16b(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32b(payload.length) ++ payload
  }

  /** Minimal valid MP4: ftyp + moov(mvhd v0, zero matrix) + mdat(payload). */
  private[graft] def mp4Bytes(payload: Array[Byte], timescale: Long,
      durationUnits: Long): Array[Byte] = {
    val mvhd = be32b(108) ++ "mvhd".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32b(0) ++ be32b(0) ++
      be32b(timescale) ++ be32b(durationUnits) ++ new Array[Byte](108 - 28)
    be32b(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32b(0) ++
      be32b(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd ++
      be32b(8L + payload.length) ++ "mdat".getBytes("US-ASCII") ++ payload
  }

  /** Deterministic audio/video blob synthesis over a text column: even ids
    * become WAV (PCM params derived from the id), odd ids MP4 (timescale/
    * duration derived from the id and payload length) — so a DuckDB oracle
    * can compute the expected [[decodeAvMeta]] output analytically from
    * `length(text)` without parsing bytes. */
  def synthAv(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType)))
    df.select(col(idCol).cast(LongType), col(textCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val bytes =
          if (id % 2 == 0)
            wavBytes(payload, channels = (1 + (id / 2) % 2).toInt,
              sampleRate = (8000 + ((id / 2) % 3) * 4000).toInt,
              bitsPerSample = 16)
          else mp4Bytes(payload, timescale = 1000 + id % 10,
            durationUnits = payload.length * 25L)
        Row(id, bytes)
      }
    }(Encoders.row(schema))
  }

  private val avSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("kind", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", LongType)))

  /** Decode each media blob to audio/video metadata — REAL header parsing
    * for WAV (RIFF/fmt/data walk) and MP4 (moov/mvhd walk), both
    * dependency-free; anything else reports kind "unknown" with null
    * fields (no fake here: a/v metadata is either parsed or absent). */
  def decodeAvMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0 else bytes.length
        val safe = if (bytes == null) Array.empty[Byte] else bytes
        wavMeta(safe) match {
          case Some((ch, rate, bits, durMs)) =>
            Row(id, n, "wav", ch, rate, bits, durMs)
          case None => mp4Meta(safe) match {
            case Some((_, _, durMs)) =>
              Row(id, n, "mp4", null, null, null, durMs)
            case None => aviMeta(safe) match {
              case Some((_, _, total, usPerFrame, _)) =>
                Row(id, n, "avi", null, null, null,
                  total.toLong * usPerFrame / 1000L)
              case None => Row(id, n, "unknown", null, null, null, null)
            }
          }
        }
      }
    }(Encoders.row(avSchema))

  // ---- VIDEO: real AVI container + real frame pixel decode -------------
  //
  // AVI is RIFF (the same little-endian chunk walk as WAV): RIFF/"AVI "
  // holds LIST/hdrl (avih main header + LIST/strl stream headers) and
  // LIST/movi whose subchunks "##db" (uncompressed DIB) / "##dc"
  // (compressed) are the frames. Two codecs need NO external library:
  //  - raw 24-bit DIB (BI_RGB, bottom-up BGR rows, 4-byte row stride) —
  //    pure byte math, pixel-exact, so a SQL oracle can replay the decode;
  //  - image-per-frame codecs whose payload ImageIO reads (PNG pixel-exact,
  //    MJPG = real lossy JPEG frames).
  // This closes the former "video pixels are stubbed" gap the same way
  // ImageIO closed images: real container, real pixels, no codec jar.

  private def dibStride(w: Int) = ((3 * w + 3) / 4) * 4

  /** AVI main-header fields from LIST/hdrl/avih plus the stream fourcc from
    * strh: (width, height, totalFrames, usPerFrame, handler). */
  private[graft] def aviMeta(b: Array[Byte]): Option[(Int, Int, Int, Int, String)] = {
    def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'A' || b(9) != 'V' || b(10) != 'I' ||
        b(11) != ' ') return None
    def walk(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] { // (id or "LIST:type", payloadStart, payloadEnd)
        private var i = lo
        def hasNext: Boolean = i + 8 <= hi
        def next(): (String, Int, Int) = {
          val id = new String(b, i, 4, "US-ASCII")
          val size = le32(i + 4)
          val end = math.min(hi.toLong, i + 8L + size).toInt
          val out =
            if (id == "LIST" && end - i >= 12)
              ("LIST:" + new String(b, i + 8, 4, "US-ASCII"), i + 12, end)
            else (id, i + 8, end)
          i = math.min(hi.toLong, i + 8L + size + (size & 1L)).toInt
          out
        }
      }
    walk(12, b.length).collectFirst { case ("LIST:hdrl", s, e) =>
      val inner = walk(s, e).toList
      for {
        (_, as, ae) <- inner.collectFirst { case t @ ("avih", _, _) => t }
        if ae - as >= 40
        handler = inner.collectFirst { case ("LIST:strl", ss, se) =>
          walk(ss, se).collectFirst { case ("strh", hs, he) if he - hs >= 8 =>
            new String(b, hs + 4, 4, "US-ASCII")
          }
        }.flatten.getOrElse("    ")
      } yield (le32(as + 32).toInt, le32(as + 36).toInt, le32(as + 16).toInt,
        le32(as).toInt, handler)
    }.flatten
  }

  /** Frame chunks from LIST/movi without decoding anything: (frameIdx,
    * "db"|"dc", payloadOffset, payloadLen) in file order — the seek path
    * that lets stride sampling SKIP undecoded frames entirely. */
  private[graft] def aviFrameChunks(b: Array[Byte]): Iterator[(Int, String, Int, Int)] = {
    def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 12 || b(0) != 'R' || b(8) != 'A' || b(9) != 'V' ||
        b(10) != 'I') return Iterator.empty
    var moviLo = -1; var moviHi = -1
    var i = 12
    while (i + 8 <= b.length && moviLo < 0) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(i + 4)
      val end = math.min(b.length.toLong, i + 8L + size).toInt
      if (id == "LIST" && end - i >= 12 &&
          new String(b, i + 8, 4, "US-ASCII") == "movi") {
        moviLo = i + 12; moviHi = end
      }
      i = math.min(b.length.toLong, i + 8L + size + (size & 1L)).toInt
    }
    if (moviLo < 0) return Iterator.empty
    var j = moviLo
    var idx = 0
    new Iterator[(Int, String, Int, Int)] {
      private var nextChunk: (Int, String, Int, Int) = advance()
      private def advance(): (Int, String, Int, Int) = {
        while (j + 8 <= moviHi) {
          val id = new String(b, j, 4, "US-ASCII")
          val size = le32(j + 4)
          val off = j + 8
          val len = math.min(size, moviHi - off.toLong).toInt
          j = math.min(moviHi.toLong, j + 8L + size + (size & 1L)).toInt
          val suffix = id.substring(2)
          if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (suffix == "db" || suffix == "dc")) {
            val out = (idx, suffix, off, len)
            idx += 1
            return out
          }
        }
        null
      }
      def hasNext: Boolean = nextChunk != null
      def next(): (Int, String, Int, Int) = {
        val out = nextChunk; nextChunk = advance(); out
      }
    }
  }

  private val videoFrameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_ts_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("px_checksum", LongType),
    StructField("codec", StringType)))

  /** REAL video frame pixel decode over AVI blobs. Every `stride`-th frame
    * decodes; skipped frames are never touched (the chunk walk seeks past
    * them — at 100 TB the sampled-decode cost is frames/stride, not
    * frames). "##db" chunks are raw 24-bit bottom-up BGR DIBs (pure byte
    * math); "##dc" payloads go through ImageIO (PNG frames decode
    * pixel-exact; MJPG frames are real lossy JPEG). Per-frame integer
    * statistics match [[decodeImagePixels]] exactly, so the same SQL
    * oracle formula covers stills and motion. Undecodable frames are
    * dropped (parsed or absent, no fakes). */
  def decodeVideoFrames(media: DataFrame, stride: Int = 1): DataFrame =
    media.select(col("media_id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        val decoder = new PartitionImageReader
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
          aviMeta(bytes) match {
            case None => Iterator.empty
            case Some((w, h, _, usPerFrame, _)) =>
              aviFrameChunks(bytes)
                .filter { case (idx, _, _, _) => idx % stride == 0 }
                .flatMap { case (idx, kind, off, len) =>
                  val ts = idx.toLong * usPerFrame / 1000L
                  if (kind == "db" && len >= dibStride(w) * h) {
                    val stride0 = dibStride(w)
                    var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
                    var y = 0
                    while (y < h) {
                      val rowOff = off + (h - 1 - y) * stride0 // bottom-up
                      var x = 0
                      while (x < w) {
                        val bb = bytes(rowOff + 3 * x) & 0xff
                        val gg = bytes(rowOff + 3 * x + 1) & 0xff
                        val rr = bytes(rowOff + 3 * x + 2) & 0xff
                        sr += rr; sg += gg; sb += bb
                        ck += (3L * rr + 5L * gg + 7L * bb) *
                          ((x + y.toLong * w) % 1000 + 1)
                        x += 1
                      }
                      y += 1
                    }
                    Iterator.single(Row(id, idx, ts, w, h, sr, sg, sb, ck, "dib"))
                  } else if (kind == "dc") {
                    val img = decoder.read(
                      java.util.Arrays.copyOfRange(bytes, off, off + len))
                    if (img == null) Iterator.empty
                    else {
                      val iw = img.getWidth; val ih = img.getHeight
                      val px = img.getRGB(0, 0, iw, ih, null, 0, iw)
                      var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
                      var i = 0
                      while (i < px.length) {
                        val p = px(i)
                        val rr = (p >> 16) & 0xff; val gg = (p >> 8) & 0xff
                        val bb = p & 0xff
                        sr += rr; sg += gg; sb += bb
                        ck += (3L * rr + 5L * gg + 7L * bb) * (i % 1000 + 1)
                        i += 1
                      }
                      Iterator.single(Row(id, idx, ts, iw, ih, sr, sg, sb, ck,
                        "imageio"))
                    }
                  } else Iterator.empty
                }
          }
        }
      }(Encoders.row(videoFrameSchema))

  /** The closed-form frame pixel: the [[synthPng]] formula with the frame
    * index folded in, so oracles recompute any frame of any video from
    * (id, f, x, y) alone. */
  private def framePixel(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + f * 29 + x * 7 + y * 13) % 256).toInt,
    ((id * 17 + f * 23 + x * 11 + y * 5) % 256).toInt,
    ((id * 23 + f * 41 + x * 3 + y * 19) % 256).toInt)

  private def frameImage(id: Long, f: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (rr, gg, bb) = framePixel(id, f, x, y)
        px(y * w + x) = (rr << 16) | (gg << 8) | bb
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  /** Build one REAL AVI file: RIFF("AVI ") { LIST(hdrl){avih,
    * LIST(strl){strh,strf}}, LIST(movi){frames} }. `codec` "dib" writes
    * raw bottom-up BGR "00db" chunks; "png"/"jpeg" write "00dc" chunks
    * whose payload is the ImageIO encoding of each frame (fccHandler
    * "MPNG"/"MJPG"). */
  private[graft] def aviBytes(id: Long, w: Int, h: Int, nFrames: Int,
      usPerFrame: Int, codec: String): Array[Byte] = {
    val frames: Array[Array[Byte]] = (0 until nFrames).map { f =>
      if (codec == "dib") {
        val stride = dibStride(w)
        val out = new Array[Byte](stride * h)
        var y = 0
        while (y < h) {
          val rowOff = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val (rr, gg, bb) = framePixel(id, f, x, y)
            out(rowOff + 3 * x) = bb.toByte
            out(rowOff + 3 * x + 1) = gg.toByte
            out(rowOff + 3 * x + 2) = rr.toByte
            x += 1
          }
          y += 1
        }
        out
      } else if (codec == "jpeg") {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(frameImage(id, f, w, h), "jpg", bos)
        bos.toByteArray
      } else {
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (rr, gg, bb) = framePixel(id, f, x, y)
            px(y * w + x) = (rr << 16) | (gg << 8) | bb
            x += 1
          }
          y += 1
        }
        pngEncode(px, w, h)
      }
    }.toArray
    val (chunkId, handler, compression) = codec match {
      case "dib"  => ("00db", "DIB ", 0L)
      case "jpeg" => ("00dc", "MJPG", 0x47504a4dL) // 'MJPG' le
      case _      => ("00dc", "MPNG", 0x474e504dL) // 'MPNG' le
    }
    val maxFrame = frames.map(_.length).max
    def fcc(s: String) = s.getBytes("US-ASCII")
    val avih = fcc("avih") ++ le32b(56) ++ le32b(usPerFrame) ++ le32b(0) ++
      le32b(0) ++ le32b(0) ++ le32b(nFrames) ++ le32b(0) ++ le32b(1) ++
      le32b(maxFrame) ++ le32b(w) ++ le32b(h) ++ new Array[Byte](16)
    val strh = fcc("strh") ++ le32b(56) ++ fcc("vids") ++ fcc(handler) ++
      le32b(0) ++ le16b(0) ++ le16b(0) ++ le32b(0) ++ le32b(usPerFrame) ++
      le32b(1000000) ++ le32b(0) ++ le32b(nFrames) ++ le32b(maxFrame) ++
      le32b(0) ++ le32b(0) ++ le16b(0) ++ le16b(0) ++ le16b(w) ++ le16b(h)
    val strf = fcc("strf") ++ le32b(40) ++ le32b(40) ++ le32b(w) ++ le32b(h) ++
      le16b(1) ++ le16b(24) ++ le32b(compression) ++
      le32b(dibStride(w).toLong * h) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(0)
    val strl = fcc("LIST") ++ le32b(4L + strh.length + strf.length) ++
      fcc("strl") ++ strh ++ strf
    val hdrl = fcc("LIST") ++ le32b(4L + avih.length + strl.length) ++
      fcc("hdrl") ++ avih ++ strl
    val movi = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(fcc("LIST"))
      val frameBytes = frames.map { fb =>
        fcc(chunkId) ++ le32b(fb.length) ++ fb ++
          (if (fb.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      }
      bos.write(le32b(4L + frameBytes.map(_.length).sum))
      bos.write(fcc("movi"))
      frameBytes.foreach(bos.write)
      bos.toByteArray
    }
    fcc("RIFF") ++ le32b(4L + hdrl.length + movi.length) ++ fcc("AVI ") ++
      hdrl ++ movi
  }

  /** Deterministic AVI synthesis per row — REAL video files whose frame
    * pixels are the closed form [[framePixel]], so SQL oracles verify the
    * ENTIRE container-write → chunk-walk → codec-decode → aggregate loop.
    * Even ids carry raw-DIB frames, odd ids PNG-compressed "00dc" frames —
    * one query exercises both decode paths, both pixel-exact. */
  def synthAvi(df: DataFrame, idCol: String, w: Int, h: Int, nFrames: Int,
      usPerFrame: Int = 40000): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val codec = if (id % 2 == 0) "dib" else "png"
          Row(id, aviBytes(id, w, h, nFrames, usPerFrame, codec), "video/avi")
        }
      }(Encoders.row(StructType(Seq(
        StructField("media_id", LongType),
        StructField("media", BinaryType),
        StructField("media_type", StringType)))))

  /** Byte-level feature extraction: a deterministic 16-dim embedding from
    * rolling byte statistics. STUB for a real vision/audio encoder; the
    * Array[Float] output column matches the `embeddings` table shape. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        val acc = new Array[Float](16)
        var i = 0
        while (i < bytes.length) {
          acc(i % 16) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        val norm = math.max(1, bytes.length / 16)
        Row(id, acc.map(_ / norm).toIndexedSeq)
      }
    }(Encoders.row(schema))
  }
}
