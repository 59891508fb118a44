package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBinary: schema appended, all input columns preserved") {
    val df = Seq((1L, "hello")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"), $"t")
    val out = Multimodal.decodeBinary(df, "payload")
    assert(out.columns.toSeq == Seq("id", "payload", "t", "decoded"))
    assert(out.schema("decoded").dataType == Multimodal.metaSchema)
  }

  test("decodeBinary: deterministic stub values and null passthrough") {
    val df = Seq((1L, Some("hello")), (2L, None))
      .toDF("id", "t")
      .select($"id", when($"t".isNotNull, encode($"t", "UTF-8")).as("payload"))
    val rows = Multimodal.decodeBinary(df, "payload")
      .select($"id", $"decoded").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val d1 = rows(1L)
    assert(d1.getLong(0) == 5L)              // n_bytes("hello")
    assert(d1.getInt(1) == 5 && d1.getInt(2) == 35 && d1.getInt(3) == 5)
    assert(d1.getSeq[Double](4).take(2) == Seq(104.0, 101.0)) // 'h','e'
    assert(rows(2L) == null)                 // null payload passes through
  }

  test("frameSample: every step-th frame, zero-frame assets drop out") {
    val assets = Seq((1L, 10), (2L, 0), (3L, 1)).toDF("id", "n_frames")
    val frames = Multimodal.frameSample(assets, "id", "n_frames", 4)
      .as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 4), (1L, 8), (3L, 0)))
  }

  test("resizeDims: aspect-preserving integer scale with 0x0 guard") {
    val df = Seq((640, 480), (100, 400), (0, 0)).toDF("w", "h")
    val got = Multimodal.resizeDims(df, "w", "h", 256)
      .select("resized_w", "resized_h").as[(Int, Int)].collect().toSeq
    assert(got(0) == ((256, 192)))  // 640x480 → long edge 640 → 256
    assert(got(1) == ((64, 256)))   // portrait scales on height
    assert(got(2) == ((0, 0)))      // degenerate guard, no div-by-zero
  }

  test("parseDims reads true dimensions from real PNG/GIF/BMP bytes") {
    // the standard 1x1 transparent PNG and GIF (public reference
    // payloads), decoded from base64 — full real files, not synthetic
    // headers
    val png1x1 = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYP" +
        "hfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val gif1x1 = java.util.Base64.getDecoder.decode(
      "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    assert(Multimodal.parseDims(png1x1) == Some((1, 1)))
    assert(Multimodal.parseDims(gif1x1) == Some((1, 1)))

    // hand-built BITMAPINFOHEADER BMP, 13x7, height NEGATIVE
    // (top-down row order) — dims must come back absolute
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(14) = 40 // DIB header size
    bmp(18) = 13 // width LE32
    val negH = -7
    bmp(22) = (negH & 0xff).toByte; bmp(23) = ((negH >> 8) & 0xff).toByte
    bmp(24) = ((negH >> 16) & 0xff).toByte
    bmp(25) = ((negH >> 24) & 0xff).toByte
    assert(Multimodal.parseDims(bmp) == Some((13, 7)))

    // an OS/2 BITMAPCOREHEADER (DIB size 12) stores u16 dims at other
    // offsets — reading it as s32 would produce garbage, so it must
    // be rejected, as must a corrupt negative width
    val core = bmp.clone(); core(14) = 12
    assert(Multimodal.parseDims(core).isEmpty)
    val negW = bmp.clone(); negW(21) = 0x80.toByte
    assert(Multimodal.parseDims(negW).isEmpty)
  }

  test("parseDims walks JPEG markers to the SOF frame header") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // real-shape JPEG: SOI, APP0/JFIF (len 16), a COM segment, then
    // SOF0 with height=7, width=13 — dims are NOT at a fixed offset,
    // the walk must hop both leading segments
    val jfif = hex("FFD8" +
      "FFE000104A46494600010100000100010000" + // APP0, len 0x10
      "FFFE0004ABCD" +                          // COM, len 4
      "FFC0000B08" + "0007" + "000D" + "01110011") // SOF0 h=7 w=13
    assert(Multimodal.parseDims(jfif) == Some((13, 7)))
    // progressive (SOF2) parses the same frame-header layout
    val prog = hex("FFD8FFC2000B08" + "0100" + "0200" + "01110011")
    assert(Multimodal.parseDims(prog) == Some((512, 256)))
    // DHT (C4) is NOT a frame header and must be hopped, not read
    val dht = hex("FFD8" + "FFC40004ABCD" +
      "FFC0000B08" + "0007" + "000D" + "01110011")
    assert(Multimodal.parseDims(dht) == Some((13, 7)))
    // truncation before/inside SOF → None (falls back to the stub)
    assert(Multimodal.parseDims(hex("FFD8FFE000104A4649")).isEmpty)
    assert(Multimodal.parseDims(hex("FFD8FFC0000B0800")).isEmpty)
    // desync (non-marker byte where a marker must be) → None
    assert(Multimodal.parseDims(hex("FFD800FFC0000B080007000D01")).isEmpty)
  }

  test("parseDims reads WebP VP8X / VP8 / VP8L layouts") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // VP8X: canvas (13-1, 7-1) as LE u24
    val vp8x = hex("52494646000000005745425056503858" +
      "0A00000000000000" + "0C0000" + "060000")
    assert(Multimodal.parseDims(vp8x) == Some((13, 7)))
    // real 1x1 lossy webp (public reference payload)
    val real = java.util.Base64.getDecoder.decode(
      "UklGRiYAAABXRUJQVlA4IBoAAAAwAQCdASoBAAEAAQAcJaQAA3AA/vuUAAA=")
    assert(Multimodal.parseDims(real) == Some((1, 1)))
    // VP8L: 14-bit (w-1)=12, (h-1)=6 packed LSB-first after 0x2F
    val bits = 12L | (6L << 14)
    val vp8l = hex("5249464600000000574542505650384C" +
      "0A0000002F" +
      f"${bits & 0xff}%02X${(bits >> 8) & 0xff}%02X" +
      f"${(bits >> 16) & 0xff}%02X${(bits >> 24) & 0xff}%02X" +
      "0000000000")
    assert(Multimodal.parseDims(vp8l) == Some((13, 7)))
    // truncated container → None
    assert(Multimodal.parseDims(hex("52494646000000005745425056")).isEmpty)
  }

  test("parseDims: text starting with an ASCII magic does NOT sniff") {
    def t(s: String) = s.getBytes("UTF-8")
    // GIF/BMP magics are printable — plain prose must fall through to
    // the stub, or text pipelines would silently corrupt
    assert(Multimodal.parseDims(t("BMW builds cars and motorcycles")).isEmpty)
    assert(Multimodal.parseDims(t("GIF89a is an image format spec")).isEmpty)
    assert(Multimodal.parseDims(t("plain words only here at all")).isEmpty)
    assert(Multimodal.parseDims(Array.emptyByteArray).isEmpty)
  }

  test("decodeBinary routes real images to the parser, text to the stub") {
    val png1x1 = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYP" +
        "hfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val txt = "hello".getBytes("UTF-8")
    val df = Seq((1L, png1x1), (2L, txt)).toDF("id", "payload")
    val rows = Multimodal.decodeBinary(df, "payload")
      .select($"id", $"decoded").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val img = rows(1L)
    assert(img.getInt(1) == 1 && img.getInt(2) == 1) // true 1x1 dims
    assert(img.getInt(3) == 1)                       // single frame
    assert(img.getLong(0) == png1x1.length.toLong)
    val stub = rows(2L)
    assert(stub.getInt(1) == 5 && stub.getInt(2) == 35) // stub arithmetic
  }

  test("decodeBinary survives repartitioning (per-partition batching)") {
    val df = (1 to 100).map(i => (i.toLong, "x" * i)).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val out = Multimodal.decodeBinary(df.repartition(13), "payload")
      .select($"id", $"decoded.n_bytes").as[(Long, Long)]
      .collect().toMap
    assert(out.size == 100 && out.forall { case (i, n) => n == i })
  }

  // ---- real pixel decode (javax.imageio) ------------------------------

  /** The synthetic gray pattern the registry's ext_mm_* gates use. */
  private def patGray(x: Int, y: Int, id: Int): Int =
    (x * 7 + y * 13 + (id % 16) * 31) % 256

  /** Hand-rolled 24-bit bottom-up BMP (independent byte-level writer —
    * NOT the Column-expression builder the registry queries use).
    */
  private def bmpBytes(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val img = stride * h
    val out = java.nio.ByteBuffer.allocate(54 + img)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + img).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(img).putInt(0).putInt(0).putInt(0).putInt(0)
    for (r <- 0 until h) { // file rows bottom-up
      val y = h - 1 - r
      for (x <- 0 until w) {
        val g = gray(x, y).toByte
        out.put(g).put(g).put(g)
      }
      for (_ <- w * 3 until stride) out.put(0.toByte)
    }
    out.array()
  }

  private def bufImg(w: Int, h: Int, gray: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  private def encodeVia(fmt: String, img: java.awt.image.BufferedImage) = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("decodeGray: BMP bytes decode to the exact source pixels") {
    // stride padding exercised via w=10 (30 bytes → padded to 32)
    for ((w, h) <- Seq((10, 7), (16, 12))) {
      val Some((dw, dh, gray)) =
        Multimodal.decodeGray(bmpBytes(w, h, patGray(_, _, 3)))
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert(gray(y * w + x) == patGray(x, y, 3),
          s"pixel ($x,$y): got ${gray(y * w + x)}")
    }
  }

  test("decodeGray: PNG is lossless — decoded grays equal the source") {
    val png = encodeVia("png", bufImg(16, 12, patGray(_, _, 5)))
    val Some((w, h, gray)) = Multimodal.decodeGray(png)
    assert((w, h) == ((16, 12)))
    for (y <- 0 until 12; x <- 0 until 16)
      assert(gray(y * 16 + x) == patGray(x, y, 5))
    // and parseDims header parity agrees with the pixel decode
    assert(Multimodal.parseDims(png).contains((16, 12)))
  }

  test("decodeGray: JPEG decodes with exact dims and a near aHash") {
    val src = bmpBytes(32, 24, patGray(_, _, 7))
    val jpeg = encodeVia("jpeg", bufImg(32, 24, patGray(_, _, 7)))
    val Some((w, h, jGray)) = Multimodal.decodeGray(jpeg)
    assert((w, h) == ((32, 24)))
    val Some((_, _, bGray)) = Multimodal.decodeGray(src)
    val d = java.lang.Long.bitCount(
      Multimodal.aHash64(jGray, 32, 24) ^ Multimodal.aHash64(bGray, 32, 24))
    assert(d <= 8, s"JPEG perceptual drift too large: hamming=$d")
  }

  test("boxGray: floor boundaries, floor means, narrow-image clamp") {
    // 4x2 image → 2x2 grid: each cell averages a 2x1 block
    val g = Array(0, 10, 20, 30, 40, 50, 60, 70)
    assert(Multimodal.boxGray(g, 4, 2, 2, 2).toSeq ==
      Seq((0 + 10) / 2, (20 + 30) / 2, (40 + 50) / 2, (60 + 70) / 2))
    // 7/2 floor mean
    assert(Multimodal.boxGray(Array(3, 4), 2, 1, 1, 1).toSeq == Seq(3))
    // image narrower than the grid: 1x1 replicates into every cell
    assert(Multimodal.boxGray(Array(9), 1, 1, 8, 8).forall(_ == 9))
  }

  test("aHash64/dHash64: known bit layout on a hand-built gradient") {
    // 8x8 image matching the aHash grid 1:1 — cells are the pixels
    val g = Array.tabulate(64)(i => i * 4) // mean = 126, cells>126 ⇔ i>31
    val a = Multimodal.aHash64(g, 8, 8)
    assert(a == 0x00000000FFFFFFFFL) // bottom half brighter than mean
    // 9x8 image matching the dHash grid 1:1, strictly increasing
    // left-to-right ⇒ every dHash bit set
    val g9 = Array.tabulate(72)(i => (i % 9) * 20 + i / 9)
    assert(Multimodal.dHash64(g9, 9, 8) == -1L)
    // flat image: no cell above mean, no gradient — both hashes zero
    val flat = Array.fill(64)(7)
    assert(Multimodal.aHash64(flat, 8, 8) == 0L)
    assert(Multimodal.dHash64(flat, 8, 8) == 0L)
  }

  test("grayHist: exact fractions over bins, sums to 1") {
    val g = Array(0, 15, 16, 255) // bins 0,0,1,15
    val hist = Multimodal.grayHist(g, 4, 1)
    assert(hist(0) == 0.5 && hist(1) == 0.25 && hist(15) == 0.25)
    assert(hist.sum == 1.0)
  }

  test("imageFeatures: real decode, null and non-image passthrough") {
    val rows = Seq(
      (1L, bmpBytes(16, 12, patGray(_, _, 1))),
      (2L, "just some text".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.imageFeatures(rows, "payload")
      .select($"id", $"img").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val img1 = out(1L)
    assert(img1.getInt(0) == 16 && img1.getInt(1) == 12)
    val expGray = Array.tabulate(12 * 16)(i => patGray(i % 16, i / 16, 1))
    assert(img1.getLong(2) == Multimodal.aHash64(expGray, 16, 12))
    assert(img1.getLong(3) == Multimodal.dHash64(expGray, 16, 12))
    assert(img1.getSeq[Double](4).sum == 1.0)
    assert(out(2L) == null && out(3L) == null)
  }

  test("image near-dup: identical images pair at hamming 0 via sigPairs64") {
    val mk = (id: Int) => bmpBytes(16, 16, patGray(_, _, id))
    val docs = Seq((1L, mk(1)), (2L, mk(17)), (3L, mk(4)))
      .toDF("doc_id", "payload") // ids 1 and 17 share id%16 ⇒ same image
    val sigs = Multimodal.imageFeatures(docs, "payload")
      .select($"doc_id".as("did"), $"img.ahash".as("sig"))
    val pairs = Dedup.sigPairs64(sigs, maxHamming = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  // ---- real PCM audio decode --------------------------------------

  /** Audio container bytes via the JDK's own WRITER (AudioSystem.write)
    * — an independent construction of the format our decoder parses.
    */
  private def audioBytes(samples: Array[Int], rate: Float, bits: Int,
                         channels: Int, signed: Boolean, bigEndian: Boolean,
                         fileType: javax.sound.sampled.AudioFileFormat.Type)
      : Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, bits, channels, signed, bigEndian)
    val bytesPer = bits / 8
    val data = new Array[Byte](samples.length * bytesPer * channels)
    samples.zipWithIndex.foreach { case (s, i) =>
      (0 until channels).foreach { c =>
        val off = (i * channels + c) * bytesPer
        // same sample on every channel; features read channel 0
        if (bits == 8) data(off) = (if (signed) s else s + 128).toByte
        else {
          val v = if (signed) s else s + 32768
          if (bigEndian) { data(off) = (v >> 8).toByte; data(off + 1) = v.toByte }
          else { data(off) = v.toByte; data(off + 1) = (v >> 8).toByte }
        }
      }
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, fileType, out)
    out.toByteArray
  }

  private def expectedFeats(samples: Array[Int]): (Int, Long, Long) = {
    val peak = if (samples.isEmpty) 0 else samples.map(math.abs).max
    val zc = samples.iterator.sliding(2).withPartial(false)
      .count { case Seq(a, b) => (a < 0) != (b < 0) }
    val sumsq = samples.map(s => s.toLong * s).sum
    (peak, zc.toLong, sumsq)
  }

  test("decodePcm: 16-bit mono WAV round-trips exact waveform features") {
    val samples = Array.tabulate(160)(i => (i * 131 + 7) % 2001 - 1000)
    val wav = audioBytes(samples, 8000f, 16, 1, signed = true,
      bigEndian = false, javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val r = Multimodal.decodePcm(wav).get
    val (peak, zc, sumsq) = expectedFeats(samples)
    assert(r.getInt(0) == 1 && r.getInt(1) == 8000 && r.getInt(2) == 16)
    assert(r.getLong(3) == 160L && r.getLong(4) == 20L) // 160/8k = 20 ms
    assert(r.getInt(5) == peak && r.getLong(6) == zc && r.getLong(7) == sumsq)
  }

  test("decodePcm: big-endian AIFF and stereo frames decode channel 0") {
    val samples = Array.tabulate(100)(i => if (i % 4 < 2) 900 else -900)
    val aiff = audioBytes(samples, 16000f, 16, 2, signed = true,
      bigEndian = true, javax.sound.sampled.AudioFileFormat.Type.AIFF)
    val r = Multimodal.decodePcm(aiff).get
    val (peak, zc, sumsq) = expectedFeats(samples)
    assert(r.getInt(0) == 2 && r.getInt(1) == 16000 && r.getInt(2) == 16)
    assert(r.getLong(3) == 100L)
    assert(r.getInt(5) == peak && r.getLong(6) == zc && r.getLong(7) == sumsq)
  }

  test("decodePcm: 8-bit unsigned WAV recenters to signed samples") {
    val samples = Array.tabulate(64)(i => (i % 11) * 10 - 50) // [-50, 50]
    val wav = audioBytes(samples, 8000f, 8, 1, signed = false,
      bigEndian = false, javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val r = Multimodal.decodePcm(wav).get
    val (peak, zc, sumsq) = expectedFeats(samples)
    assert(r.getInt(2) == 8 && r.getLong(3) == 64L)
    assert(r.getInt(5) == peak && r.getLong(6) == zc && r.getLong(7) == sumsq)
  }

  test("decodePcm: non-audio payloads and nulls are total") {
    assert(Multimodal.decodePcm("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodePcm(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePcm(bmpBytes(8, 8, patGray(_, _, 1))).isEmpty)
  }

  test("audioFeatures: columns preserved, null and non-audio pass null") {
    val samples = Array.tabulate(80)(i => (i % 7) * 100 - 300)
    val wav = audioBytes(samples, 8000f, 16, 1, signed = true,
      bigEndian = false, javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val df = Seq((1L, wav), (2L, "text".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = Multimodal.audioFeatures(df, "payload")
    assert(out.columns.toSeq == Seq("id", "payload", "audio"))
    val rows = out.select($"id", $"audio").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(rows(1L).getLong(3) == 80L)
    assert(rows(2L) == null && rows(3L) == null)
  }

  // ---- real animated-GIF frame walk --------------------------------

  /** Animated GIF via the JDK's own GIF WRITER (writeToSequence) — an
    * independent construction of the stream gifFrameCount walks.
    */
  private def animatedGif(nFrames: Int): Array[Byte] = {
    import javax.imageio._
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(x => img.setRGB(x, 0, f * 0x111111))
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  test("gifFrameCount matches the JDK GIF writer's frame count") {
    Seq(1, 3, 7).foreach { n =>
      assert(Multimodal.gifFrameCount(animatedGif(n)) == Some(n),
        s"n=$n")
    }
  }

  test("gifFrameCount: non-GIF, truncated, and header-only return None") {
    assert(Multimodal.gifFrameCount("GIF89a then prose".getBytes).isEmpty)
    val full = animatedGif(3)
    assert(Multimodal.gifFrameCount(full.take(full.length - 2)).isEmpty)
    assert(Multimodal.gifFrameCount(full.take(13)).isEmpty) // header only
    assert(Multimodal.gifFrameCount("hello".getBytes).isEmpty)
  }

  test("gifFrames + frameSample: real counts drive the sampling rows") {
    val df = Seq((1L, animatedGif(5)), (2L, "nope".getBytes))
      .toDF("id", "payload")
    val counted = Multimodal.gifFrames(df, "payload")
    val got = counted.select($"id", $"n_frames")
      .as[(Long, Option[Int])].collect().toMap
    assert(got(1L) == Some(5) && got(2L).isEmpty)
    val frames = Multimodal.frameSample(counted, "id", "n_frames", 2)
      .as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 2), (1L, 4)))
  }

  // ---- G.711 companded audio decode --------------------------------

  test("G.711 expanders agree bit-exactly with the JDK codec, all 256 codes") {
    import javax.sound.sampled._
    val codes = Array.tabulate(256)(_.toByte)
    Seq[(AudioFormat.Encoding, Int => Int)](
      (AudioFormat.Encoding.ULAW, Multimodal.ulawExpand),
      (AudioFormat.Encoding.ALAW, Multimodal.alawExpand)).foreach {
      case (enc, ref) =>
        // two independent implementations: the JDK's table-driven codec
        // vs our ITU-T formula expanders
        val fmt = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
        val in = new AudioInputStream(
          new java.io.ByteArrayInputStream(codes), fmt, 256L)
        val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false)
        val dec = AudioSystem.getAudioInputStream(pcm, in).readAllBytes()
        (0 until 256).foreach { i =>
          val jdk = ((dec(2 * i) & 0xff) | (dec(2 * i + 1) << 8)).toShort.toInt
          assert(jdk == ref(i), s"$enc code $i")
        }
    }
  }

  test("decodePcm: JDK-written mu-law/A-law AU decodes to expanded samples") {
    import javax.sound.sampled._
    val codes = Array.tabulate(200)(i => (i * 31 + 5) % 256)
    Seq[(AudioFormat.Encoding, Int => Int)](
      (AudioFormat.Encoding.ULAW, Multimodal.ulawExpand),
      (AudioFormat.Encoding.ALAW, Multimodal.alawExpand)).foreach {
      case (enc, ref) =>
        val fmt = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
        val in = new AudioInputStream(
          new java.io.ByteArrayInputStream(codes.map(_.toByte)),
          fmt, codes.length.toLong)
        val out = new java.io.ByteArrayOutputStream()
        AudioSystem.write(in, AudioFileFormat.Type.AU, out)
        val r = Multimodal.decodePcm(out.toByteArray).get
        val (peak, zc, sumsq) = expectedFeats(codes.map(ref))
        assert(r.getInt(0) == 1 && r.getInt(1) == 8000 && r.getInt(2) == 8,
          s"$enc header")
        assert(r.getLong(3) == 200L)
        assert(r.getInt(5) == peak && r.getLong(6) == zc &&
          r.getLong(7) == sumsq, s"$enc features")
    }
  }

  // ---- real AVI video frame decode ---------------------------------

  /** Minimal AVI writer (independent of the engine's Column-expression
    * synthesis): hdrl LIST with a 'vids' strh + BITMAPINFOHEADER strf,
    * movi LIST with one '00db'/'00dc' chunk per frame payload,
    * word-aligned chunks throughout.
    */
  private def aviBytes(w: Int, h: Int, frames: Seq[Array[Byte]],
                       mjpeg: Boolean): Array[Byte] = {
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1)).order(bo)
      buf.put(fourcc.getBytes("US-ASCII")).putInt(body.length).put(body)
      buf.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val strh = java.nio.ByteBuffer.allocate(56).order(bo)
      .put("vids".getBytes("US-ASCII")).array() // rest zero
    val strf = {
      val b = java.nio.ByteBuffer.allocate(40).order(bo)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.putInt(if (mjpeg) 0x47504A4D else 0) // 'MJPG' fourcc | BI_RGB
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(chunk(if (mjpeg) "00dc" else "00db", _)).toArray)
    val riff = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    java.nio.ByteBuffer.allocate(8 + riff.length).order(bo)
      .put("RIFF".getBytes("US-ASCII")).putInt(riff.length).put(riff)
      .array()
  }

  /** Bottom-up 24-bit BI_RGB DIB (4-byte row stride) with gray g(x,y). */
  private def dibBytes(w: Int, h: Int, g: (Int, Int) => Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (g(x, y) & 0xff).toByte
      val off = (h - 1 - y) * stride + x * 3
      out(off) = v; out(off + 1) = v; out(off + 2) = v
    }
    out
  }

  test("parseAvi walks RIFF into dims + frame payloads; total on garbage") {
    val frames = Seq(dibBytes(6, 5, (x, y) => x + y),
      dibBytes(6, 5, (x, y) => x * y))
    val avi = aviBytes(6, 5, frames, mjpeg = false)
    val got = Multimodal.parseAvi(avi).get
    assert(got.width == 6 && got.height == 5 && got.bitCount == 24 &&
      got.compression == 0)
    assert(got.frames.size == 2 &&
      got.frames(0).sameElements(frames(0)) &&
      got.frames(1).sameElements(frames(1)))
    // totality: prose, truncation mid-chunk, and non-AVI RIFF
    assert(Multimodal.parseAvi("RIFF but prose after".getBytes).isEmpty)
    assert(Multimodal.parseAvi(avi.take(avi.length - 7)).isEmpty)
    assert(Multimodal.parseAvi(avi.take(30)).isEmpty)
    assert(Multimodal.parseAvi("hello world".getBytes).isEmpty)
  }

  test("videoFrameHashes: DIB frames decode to exact per-frame hashes") {
    // w=6 forces a padded 20-byte stride — the row-walk must skip it
    def pat(f: Int)(x: Int, y: Int): Int = (x * 40 + y * 30 + f * 50) % 256
    val avi = aviBytes(6, 5,
      (0 until 3).map(f => dibBytes(6, 5, pat(f))), mjpeg = false)
    val df = Seq((1L, avi), (2L, "not a video".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val rows = Multimodal.videoFrameHashes(df, "payload")
      .select($"id", $"frame_idx", $"width", $"height", $"ahash", $"dhash")
      .as[(Long, Int, Int, Int, Long, Long)].collect().sortBy(_._2)
    assert(rows.forall(_._1 == 1L) && rows.length == 3) // others drop out
    rows.foreach { case (_, f, w, h, ahash, dhash) =>
      assert(w == 6 && h == 5)
      val gray = Array.tabulate(6 * 5)(i => pat(f)(i % 6, i / 6))
      assert(ahash == Multimodal.aHash64(gray, 6, 5), s"frame $f ahash")
      assert(dhash == Multimodal.dHash64(gray, 6, 5), s"frame $f dhash")
    }
  }

  test("videoFrameHashes: MJPEG frames route through the ImageIO decoder") {
    def jpeg(f: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach { x =>
        val v = (x * 16 + f * 60) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val frames = (0 until 2).map(jpeg)
    val avi = aviBytes(16, 16, frames, mjpeg = true)
    val got = Multimodal.videoFrameHashes(
        Seq((1L, avi)).toDF("id", "payload"), "payload")
      .select($"frame_idx", $"width", $"height", $"ahash")
      .as[(Int, Int, Int, Long)].collect().sortBy(_._1)
    assert(got.length == 2)
    got.foreach { case (f, w, h, ahash) =>
      // the same JPEG bytes decoded directly must yield the same hash
      val (dw, dh, gray) = Multimodal.decodeGray(frames(f)).get
      assert(w == dw && h == dh && w == 16)
      assert(ahash == Multimodal.aHash64(gray, dw, dh), s"frame $f")
    }
  }

  test("sceneCuts: per-asset consecutive Hamming, first frame excluded") {
    val frames = Seq(
      (1L, 0, 0L), (1L, 1, 1L), (1L, 2, 0xFF00L), // d=1 then d=9
      (2L, 0, 5L)) // single frame: no pair rows
      .toDF("id", "frame_idx", "ahash")
    val got = Multimodal.sceneCuts(frames, "id", "frame_idx", "ahash", 3)
      .as[(Long, Int, Int, Int)].collect().toSet
    // 0^1 = 1 bit; 1^0xFF00 = 9 bits
    assert(got == Set((1L, 1, 1, 0), (1L, 2, 9, 1)))
  }
}
