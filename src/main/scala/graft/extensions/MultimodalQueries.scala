package graft.extensions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.tables.Tables.documents

/** Driver-checked queries for the REAL pixel path in
  * [[graft.operators.Multimodal]] — `javax.imageio` decode, perceptual
  * aHash/dHash fingerprints, grayscale histogram features, and image
  * near-dup through the banded 64-bit machinery.
  *
  * How a non-SQL codec gets a FULL hash oracle: each doc synthesizes a
  * valid uncompressed 24-bit BMP whose pixel at (x, y) is the gray
  * value g = (7x + 13y + 31·(doc_id mod 16)) mod 256, with dims
  * W = 8+4·(doc_id mod 4), H = 8+4·(doc_id mod 3) (W is a multiple of
  * 4 so rows need no padding). The engine runs the actual decoder over
  * the actual bytes; the DuckDB oracle never parses BMP — it re-derives
  * the pixels from the same arithmetic and pushes them through the
  * integer-exact feature definitions (floor-boundary box averages,
  * floor means, luma = g for gray pixels since the BT.601 weights sum
  * to 256). Any error in the BMP writer, the ImageIO row order
  * (bottom-up), the luma weights, or a hash bit position breaks the
  * hash compare. 64-bit hashes are emitted as (hi, lo) 32-bit halves
  * so both engines stay in exact BIGINT arithmetic.
  *
  * The pattern repeats every lcm(4, 3, 16) = 48 ids, so the corpus
  * contains genuine exact-duplicate image classes — the near-dup gate
  * has real pairs to find.
  */
private[graft] object MultimodalQueries {

  // ---- synthetic BMP payload (engine side, pure Column expressions) --

  private def wCol(id: Column): Column =
    (lit(8) + pmod(id, lit(4)) * 4).cast("int")
  private def hCol(id: Column): Column =
    (lit(8) + pmod(id, lit(3)) * 4).cast("int")
  private def gCol(x: Column, y: Column, id: Column): Column =
    pmod(x * 7 + y * 13 + pmod(id, lit(16)) * 31, lit(256))

  private def byteHex(c: Column): Column =
    lpad(hex(c.bitwiseAND(lit(255L))), 2, "0")
  private def le32hex(c: Column): Column =
    concat(byteHex(c), byteHex(shiftright(c, 8)),
      byteHex(shiftright(c, 16)), byteHex(shiftright(c, 24)))

  /** Synthetic MPEG-1 Layer III frame stream (ext_mm_mp3): 3–7 frames,
    * CBR 128 kbps (even ids) or VBR cycling 128/160/192 (odd ids),
    * sample rate from {44100, 48000, 32000} by id, padding bit
    * alternating per frame. Headers are real — the engine's walk must
    * parse them and hop the exact frame lengths.
    */
  private def syntheticMp3(id: Column): Column = {
    val nf = lit(3) + pmod(id, lit(5))
    val sri = pmod(id, lit(3))
    val rate = when(sri === 0, lit(44100))
      .when(sri === 1, lit(48000)).otherwise(lit(32000))
    val isvbr = pmod(id, lit(2)) === 1
    def frameHex(f: Column): Column = {
      val bri = when(isvbr, lit(9) + pmod(id + f, lit(3)))
        .otherwise(lit(9))
      val kbps = when(bri === 9, lit(128)).when(bri === 10, lit(160))
        .otherwise(lit(192))
      val pad = pmod(f, lit(2))
      val b2 = bri * 16 + sri * 4 + pad * 2
      val flen = floor((lit(144000) * kbps).cast("double") /
        rate.cast("double")).cast("int") + pad
      concat(lit("FFFB"), byteHex(b2), lit("00"),
        lit("0" * 4000).substr(lit(1), (flen - 4) * 2))
    }
    unhex(array_join(
      transform(sequence(lit(0), nf - 1), f => frameHex(f)), ""))
  }

  /** W×H 24-bit bottom-up BMP with pixel (x,y) = gray g(x,y,id). */
  private def syntheticBmp(id: Column): Column = {
    val w = wCol(id)
    val h = hCol(id)
    val imgSize = w * 3 * h // row stride w*3 is already 4-byte aligned
    val header = concat(
      lit("424D"), le32hex(imgSize + 54), lit("0000000036000000"),
      lit("28000000"), le32hex(w), le32hex(h), lit("01001800"),
      lit("00000000"), le32hex(imgSize),
      lit("00000000000000000000000000000000"))
    val body = array_join(
      transform(sequence(h - 1, lit(0), lit(-1)), y =>
        array_join(transform(sequence(lit(0), w - 1), x =>
          repeat(byteHex(gCol(x, y, id)), 3)), "")), "")
    unhex(concat(header, body))
  }

  /** Decoded features over the synthetic corpus (shared by all gates). */
  private def feats(s: SparkSession, d: String): DataFrame =
    Multimodal.imageFeatures(
      documents(s, d).select(col("doc_id"),
        syntheticBmp(col("doc_id")).as("payload")),
      "payload")

  // ---- synthetic WAV payload (engine side, pure Column expressions) --
  //
  // Same full-oracle trick for the REAL javax.sound decode path: each
  // doc synthesizes a valid 16-bit mono 8 kHz PCM WAV whose sample i of
  // n = 120 + (doc_id mod 50) is the pseudo-sawtooth
  // s_i = (i·37 + doc_id·11) mod (2a+1) − a, a = 500 + (doc_id mod 7)·250
  // — every operand non-negative, so `%` agrees across engines. The
  // engine decodes the actual RIFF bytes through AudioSystem; the
  // DuckDB oracle never parses WAV — it re-derives the samples from the
  // same arithmetic and aggregates the integer-exact features. Any
  // error in the RIFF layout, the little-endian two's-complement sample
  // encoding, or the feature definitions breaks the hash compare.

  private def waveN(id: Column): Column = lit(120) + pmod(id, lit(50))
  private def waveA(id: Column): Column =
    lit(500) + pmod(id, lit(7)) * 250
  private def waveSample(i: Column, id: Column): Column =
    pmod(i * 37 + id * 11, waveA(id) * 2 + 1) - waveA(id)

  private def le16hex(c: Column): Column = {
    val v = c.bitwiseAND(lit(0xffffL))
    concat(byteHex(v), byteHex(shiftright(v, 8)))
  }

  /** n-sample 16-bit mono 8 kHz little-endian PCM WAV. */
  private def syntheticWav(id: Column): Column = {
    val n = waveN(id)
    val dataSize = n * 2
    val header = concat(
      lit("52494646"), le32hex(dataSize + 36), // "RIFF" + chunk size
      lit("57415645"), lit("666D7420"), // "WAVE" + "fmt "
      lit("10000000"), // fmt chunk size 16
      lit("0100"), lit("0100"), // PCM, mono
      lit("401F0000"), lit("803E0000"), // 8000 Hz, 16000 B/s
      lit("0200"), lit("1000"), // block align 2, 16 bits
      lit("64617461"), le32hex(dataSize)) // "data" + size
    val body = array_join(
      transform(sequence(lit(0), n - 1), i =>
        le16hex(waveSample(i, id))), "")
    unhex(concat(header, body))
  }

  // ---- synthetic G.711 AU payload (engine side, Column expressions) --
  //
  // The compressed-audio path under the same full-oracle trick: each
  // doc synthesizes a valid Sun AU container (big-endian header:
  // ".snd", data offset 24, data size n, encoding 1 = G.711 μ-law or
  // 27 = G.711 A-law, 8000 Hz, mono) whose n = 100 + (doc_id mod 40)
  // companded bytes are u_i = (i·17 + doc_id·7) mod 256. The engine
  // decodes the actual bytes through AudioSystem + the ITU expanders;
  // the DuckDB oracle re-derives the same expansion arithmetically
  // (the G.711 decode IS pure integer arithmetic on the code byte).

  private def be32hex(c: Column): Column =
    concat(byteHex(shiftright(c, 24)), byteHex(shiftright(c, 16)),
      byteHex(shiftright(c, 8)), byteHex(c))

  private def auN(id: Column): Column = lit(100) + pmod(id, lit(40))
  private def auCode(i: Column, id: Column): Column =
    pmod(i * 17 + id * 7, lit(256))

  /** n-byte G.711 mono 8 kHz AU stream (μ-law or A-law). */
  private def syntheticAu(id: Column, alaw: Boolean): Column = {
    val n = auN(id)
    val header = concat(lit("2E736E64"), lit("00000018"), be32hex(n),
      lit(if (alaw) "0000001B" else "00000001"),
      lit("00001F40"), lit("00000001"))
    val body = array_join(
      transform(sequence(lit(0), n - 1), i => byteHex(auCode(i, id))), "")
    unhex(concat(header, body))
  }

  /** SQL twin of [[graft.operators.Multimodal.ulawExpand]]. */
  private def ulawSql(u: String): String = {
    val v = s"(255 - ($u))"
    val t = s"(((($v % 16) * 8) + 132) * (1 << (($v // 16) % 8)))"
    s"(CASE WHEN $v >= 128 THEN 132 - $t ELSE $t - 132 END)"
  }

  /** SQL twin of [[graft.operators.Multimodal.alawExpand]]. */
  private def alawSql(u: String): String = {
    val a = s"xor(($u), 85)"
    val t = s"(CASE WHEN (($a // 16) % 8) = 0 THEN ($a % 16) * 16 + 8 " +
      s"WHEN (($a // 16) % 8) = 1 THEN ($a % 16) * 16 + 264 " +
      s"ELSE ((($a % 16) * 16 + 264) << ((($a // 16) % 8) - 1)) END)"
    s"(CASE WHEN $a >= 128 THEN $t ELSE -($t) END)"
  }

  // ---- synthetic DIB AVI (engine side, pure Column expressions) ------
  //
  // The video path under the same trick: each doc synthesizes a valid
  // AVI RIFF container (hdrl LIST with avih + a 'vids'/'DIB ' strh and
  // a 24-bit BITMAPINFOHEADER strf; movi LIST with n = 1 + doc_id mod 3
  // uncompressed '00db' frames) of 8×8 bottom-up BI_RGB frames whose
  // pixel (x, y) of frame f is the gray value
  // g = (7x + 13y + 29f + 31·(doc_id mod 16)) mod 256. The engine walks
  // the real container and decodes the real DIB bytes; the oracle
  // re-derives the pixels arithmetically. With W = H = 8 each aHash box
  // cell is exactly one pixel, so the per-frame fingerprint is directly
  // derivable.

  private def vidN(id: Column): Column =
    (lit(1) + pmod(id, lit(3))).cast("int")
  private def vidG(x: Column, y: Column, f: Column, id: Column): Column =
    pmod(x * 7 + y * 13 + f * 29 + pmod(id, lit(16)) * 31, lit(256))

  private def syntheticAvi(id: Column): Column = {
    val n = vidN(id)
    def frameBody(f: Column) = array_join(
      transform(sequence(lit(7), lit(0), lit(-1)), y =>
        array_join(transform(sequence(lit(0), lit(7)), x =>
          repeat(byteHex(vidG(x, y, f, id)), 3)), "")), "")
    val frames = array_join(transform(sequence(lit(0), n - 1), f =>
      concat(lit("30306462C0000000"), frameBody(f))), "")
    val avih = concat(
      lit("6176696838000000" + "A0860100" + "00000000" * 3),
      le32hex(n), lit("00000000" + "01000000" + "C0000000" +
        "08000000" + "08000000" + "00000000" * 4))
    val strh = concat(
      lit("7374726838000000" + "76696473" + "44494220" +
        "00000000" * 3 + "01000000" + "0A000000" + "00000000"),
      le32hex(n),
      lit("C0000000" + "00000000" * 2 + "0000000008000800"))
    val strf = lit("7374726628000000" + "28000000" + "08000000" +
      "08000000" + "01001800" + "00000000" + "C0000000" +
      "00000000" * 4)
    val hdrl = concat(lit("4C495354C00000006864726C"), avih,
      concat(lit("4C495354740000007374726C"), strh, strf))
    val movi = concat(lit("4C495354"), le32hex(n * 200 + 4),
      lit("6D6F7669"), frames)
    unhex(concat(lit("52494646"), le32hex(n * 200 + 216),
      lit("41564920"), hdrl, movi))
  }


  /** Per-frame aHash CTEs over the synthetic DIB AVIs (shared by the
    * frame and scene gates): with 8×8 frames each box cell IS the
    * pixel, mean is the 64-cell floor mean, bits split 32/32 like
    * [[aHashCtes]].
    */
  private val vidBitsCtes =
    """p AS (SELECT doc_id, 1 + doc_id % 3 AS n FROM documents),
      |fr AS (SELECT doc_id, unnest(range(n)) AS f FROM p),
      |vcells AS (SELECT doc_id, f, cy.cy AS cy, cx.cx AS cx,
      |  (cx.cx*7 + cy.cy*13 + f*29 + (doc_id % 16) * 31) % 256 AS cell
      | FROM fr, range(8) cy(cy), range(8) cx(cx)),
      |vmean AS (SELECT doc_id, f, SUM(cell)//64 AS mean
      | FROM vcells GROUP BY 1, 2),
      |vbits AS (SELECT c.doc_id, c.f,
      |  CAST(SUM(CASE WHEN c.cell > m.mean AND (c.cy*8+c.cx) < 32
      |    THEN (CAST(1 AS BIGINT) << CAST(31-(c.cy*8+c.cx) AS INT))
      |    ELSE 0 END) AS BIGINT) AS ahash_hi,
      |  CAST(SUM(CASE WHEN c.cell > m.mean AND (c.cy*8+c.cx) >= 32
      |    THEN (CAST(1 AS BIGINT) << CAST(63-(c.cy*8+c.cx) AS INT))
      |    ELSE 0 END) AS BIGINT) AS ahash_lo
      | FROM vcells c JOIN vmean m ON m.doc_id = c.doc_id AND m.f = c.f
      | GROUP BY 1, 2)""".stripMargin

  // ---- synthetic animated GIF (engine side, pure Column expressions) -
  //
  // A structurally complete GIF89a stream with f = 1 + (doc_id mod 4)
  // frames: logical screen 2×2 with no global color table, then per
  // frame a graphic-control extension + a 2×2 image descriptor with a
  // 2-bit LZW stream (one data sub-block), then the 0x3B trailer. The
  // engine's gifFrameCount walks the real block structure; the oracle
  // re-derives f arithmetically.

  private def syntheticGif(id: Column): Column = {
    val frame = // GCE (delay 5) + image descriptor 2×2 + LZW data
      "21F9040400050000" + "2C0000000002000200" + "00" + "02" +
        "024C01" + "00"
    val header = "474946383961" + "02000200" + "00" + "00" + "00"
    unhex(concat(lit(header),
      repeat(lit(frame), (lit(1) + pmod(id, lit(4))).cast("int")),
      lit("3B")))
  }

  // ---- oracle fragments (DuckDB re-derives the pixels) ---------------

  private val dimsSql =
    """dims AS (SELECT doc_id,
      |  CAST(8 + 4*(doc_id % 4) AS BIGINT) AS w,
      |  CAST(8 + 4*(doc_id % 3) AS BIGINT) AS h
      | FROM documents)""".stripMargin

  private val gSql = "((x*7 + y*13 + (doc_id % 16) * 31) % 256)"

  /** Floor-boundary box-average cell for grid gw×gh — the SQL twin of
    * [[graft.operators.Multimodal.boxGray]] (incl. the non-empty-window
    * clamp for images narrower than the grid).
    */
  private def cellSql(gw: Int, gh: Int): String = {
    val x0 = s"least(cx*w//$gw, w-1)"
    val x1 = s"greatest($x0 + 1, (cx+1)*w//$gw)"
    val y0 = s"least(cy*h//$gh, h-1)"
    val y1 = s"greatest($y0 + 1, (cy+1)*h//$gh)"
    s"(list_sum(flatten(list_transform(range($y0, $y1), y -> " +
      s"list_transform(range($x0, $x1), x -> $gSql)))) " +
      s"// (($x1 - $x0) * ($y1 - $y0)))"
  }

  /** CTEs deriving each doc's aHash as exact (hi, lo) BIGINT halves:
    * bit k = cy·8+cx lives at position 63−k, split 32/32.
    */
  private val aHashCtes =
    s"""acells AS (
       | SELECT d.doc_id, cy.cy AS cy, cx.cx AS cx, ${cellSql(8, 8)} AS cell
       | FROM dims d, range(8) cy(cy), range(8) cx(cx)),
       |amean AS (SELECT doc_id, SUM(cell)//64 AS mean
       | FROM acells GROUP BY doc_id),
       |abits AS (
       | SELECT c.doc_id,
       |  CAST(SUM(CASE WHEN c.cell > m.mean AND (c.cy*8+c.cx) < 32
       |    THEN (CAST(1 AS BIGINT) << CAST(31-(c.cy*8+c.cx) AS INT))
       |    ELSE 0 END) AS BIGINT) AS ahash_hi,
       |  CAST(SUM(CASE WHEN c.cell > m.mean AND (c.cy*8+c.cx) >= 32
       |    THEN (CAST(1 AS BIGINT) << CAST(63-(c.cy*8+c.cx) AS INT))
       |    ELSE 0 END) AS BIGINT) AS ahash_lo
       | FROM acells c JOIN amean m ON m.doc_id = c.doc_id
       | GROUP BY c.doc_id)""".stripMargin

  private val dHashCtes =
    s"""dcells AS (
       | SELECT d.doc_id, cy.cy AS cy, cx.cx AS cx, ${cellSql(9, 8)} AS cell
       | FROM dims d, range(8) cy(cy), range(9) cx(cx)),
       |dbits AS (
       | SELECT a.doc_id,
       |  CAST(SUM(CASE WHEN a.cell < b.cell AND (a.cy*8+a.cx) < 32
       |    THEN (CAST(1 AS BIGINT) << CAST(31-(a.cy*8+a.cx) AS INT))
       |    ELSE 0 END) AS BIGINT) AS dhash_hi,
       |  CAST(SUM(CASE WHEN a.cell < b.cell AND (a.cy*8+a.cx) >= 32
       |    THEN (CAST(1 AS BIGINT) << CAST(63-(a.cy*8+a.cx) AS INT))
       |    ELSE 0 END) AS BIGINT) AS dhash_lo
       | FROM dcells a JOIN dcells b
       |   ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
       | WHERE a.cx < 8 GROUP BY a.doc_id)""".stripMargin

  private def hiLo(c: Column, hi: String, lo: String): Seq[Column] = Seq(
    shiftrightunsigned(c, 32).as(hi),
    c.bitwiseAND(lit(0xFFFFFFFFL)).as(lo))

  val all: Seq[Q] = Seq(

    // The whole real-decode path under one hash gate: BMP bytes →
    // ImageIO pixels → luma → box grids → fingerprint bits.
    Q("ext_mm_phash",
      s"""WITH $dimsSql,
         |$aHashCtes,
         |$dHashCtes
         |SELECT d.doc_id, CAST(d.w AS INT) AS width,
         | CAST(d.h AS INT) AS height,
         | a.ahash_hi, a.ahash_lo, b.dhash_hi, b.dhash_lo
         |FROM dims d
         |JOIN abits a ON a.doc_id = d.doc_id
         |JOIN dbits b ON b.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      feats(s, d).select(
        col("doc_id") +: col("img.width").as("width") +:
          col("img.height").as("height") +:
          (hiLo(col("img.ahash"), "ahash_hi", "ahash_lo") ++
            hiLo(col("img.dhash"), "dhash_hi", "dhash_lo")): _*)
        .orderBy(col("doc_id"))
    },

    // Image near-dup = the multimodal twin of text SimHash: perceptual
    // aHash routed through the SAME banded 8×8 pigeonhole pair plan
    // (Dedup.sigPairs64 — never all-pairs). The oracle brute-forces
    // true Hamming over its re-derived hashes; banding at maxHamming=3
    // is within the ≤7 recall guarantee, so the sets must agree.
    Q("ext_mm_phash_neardup",
      s"""WITH $dimsSql,
         |$aHashCtes
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
         |   + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INT) AS hamming
         |FROM abits a JOIN abits b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
         |   + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.sigPairs64(
          feats(s, d).select(col("doc_id").as("did"),
            col("img.ahash").as("sig")),
          maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Histogram features, flattened to scalar (doc_id, bin, frac) rows
    // per the driver-gate shape contract.
    Q("ext_mm_hist",
      s"""WITH $dimsSql,
         |px AS (SELECT doc_id, w, h,
         |  unnest(flatten(list_transform(range(h), y ->
         |    list_transform(range(w), x -> $gSql // 16)))) AS bin
         | FROM dims),
         |cnt AS (SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS c
         | FROM px GROUP BY 1, 2),
         |spine AS (SELECT d.doc_id, d.w, d.h, b.b AS bin
         | FROM dims d, range(16) b(b))
         |SELECT s.doc_id, CAST(s.bin AS INT) AS bin,
         | CAST(COALESCE(c.c, 0) AS DOUBLE) / (s.w * s.h) AS frac
         |FROM spine s LEFT JOIN cnt c
         |  ON c.doc_id = s.doc_id AND c.bin = s.bin
         |ORDER BY s.doc_id, s.bin""".stripMargin) { (s, d) =>
      feats(s, d)
        .select(col("doc_id"),
          posexplode(col("img.hist")).as(Seq("bin", "frac")))
        .orderBy(col("doc_id"), col("bin"))
    },

    // Real-feature ANN: cosine top-k over the decoded histograms —
    // decoded pixels feed Similarity.bruteKnn unchanged. Same-class
    // docs are exact ties (identical vectors); both engines break them
    // by ascending neighbor id.
    Q("ext_mm_knn", {
      val px = "flatten(list_transform(range(h), y -> " +
        s"list_transform(range(w), x -> $gSql)))"
      val featSql = "list_transform(range(16), b -> " +
        s"CAST(len(list_filter($px, v -> v // 16 = b)) AS DOUBLE) / (w * h))"
      def dot(x: String, y: String) =
        s"list_sum(list_transform(range(1, 17), i -> ${x}_f[i] * ${y}_f[i]))"
      val cos =
        s"(${dot("c", "q")} / (sqrt(${dot("c", "c")}) * sqrt(${dot("q", "q")})))"
      s"""WITH $dimsSql,
         |feats AS (SELECT doc_id, $featSql AS f FROM dims)
         |SELECT query_id, neighbor_id, rank, cosine FROM (
         | SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY q.doc_id
         |    ORDER BY $cos DESC, c.doc_id) AS INT) AS rank,
         |  $cos AS cosine
         | FROM (SELECT doc_id, f AS q_f FROM feats) q
         | JOIN (SELECT doc_id, f AS c_f FROM feats) c
         |   ON q.doc_id != c.doc_id
         | WHERE q.doc_id < 5)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      val f = feats(s, d).select(col("doc_id"),
        col("img.hist").as("embedding"))
      Similarity.bruteKnn(f, f.filter(col("doc_id") < 5),
          "doc_id", "embedding", k = 3)
        .orderBy(col("query_id"), col("rank"))
    },

    // The whole real PCM-audio path under one hash gate: RIFF bytes →
    // AudioSystem frames → channel-0 samples → integer-exact waveform
    // features. The oracle re-derives the samples arithmetically
    // (1-based list indexing: smp[i], smp[i+1] for i in range(1, n)
    // are the 0-based consecutive pairs (s_{i-1}, s_i)).
    Q("ext_mm_audio",
      """WITH p AS (SELECT doc_id,
        |  120 + doc_id % 50 AS n,
        |  500 + (doc_id % 7) * 250 AS a FROM documents),
        |s AS (SELECT doc_id, n, list_transform(range(n), i ->
        |  (i*37 + doc_id*11) % (2*a + 1) - a) AS smp FROM p)
        |SELECT doc_id,
        | CAST(1 AS INT) AS channels, CAST(8000 AS INT) AS sample_rate,
        | CAST(16 AS INT) AS bits,
        | CAST(n AS BIGINT) AS n_samples,
        | CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        | CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
        | CAST(len(list_filter(range(1, n), i ->
        |   (smp[i] < 0) != (smp[i+1] < 0))) AS BIGINT) AS zero_crossings,
        | CAST(list_sum(list_transform(smp, v -> v*v)) AS BIGINT) AS sumsq
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.audioFeatures(
          documents(s, d).select(col("doc_id"),
            syntheticWav(col("doc_id")).as("payload")),
          "payload")
        .select(col("doc_id"), col("audio.channels").as("channels"),
          col("audio.sample_rate").as("sample_rate"),
          col("audio.bits").as("bits"),
          col("audio.n_samples").as("n_samples"),
          col("audio.duration_ms").as("duration_ms"),
          col("audio.peak").as("peak"),
          col("audio.zero_crossings").as("zero_crossings"),
          col("audio.sumsq").as("sumsq"))
        .orderBy(col("doc_id"))
    },

    // Real multi-frame GIF walk feeding the frame-sampling primitive:
    // gifFrameCount over complete synthesized GIF89a streams, then
    // every 2nd frame via frameSample. The oracle re-derives
    // f = 1 + doc_id % 4 and unnests the same stepped range.
    Q("ext_mm_gif_frames",
      """WITH f AS (SELECT doc_id,
        |  1 + doc_id % 4 AS n_frames FROM documents)
        |SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
        | CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      val counted = Multimodal.gifFrames(
        documents(s, d).select(col("doc_id"),
          syntheticGif(col("doc_id")).as("payload")),
        "payload")
      Multimodal.frameSample(counted, "doc_id", "n_frames", step = 2)
        .join(counted.select(col("doc_id"), col("n_frames")), "doc_id")
        .select(col("doc_id"), col("n_frames"), col("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // The whole compressed-audio (G.711) path under one hash gate: AU
    // container bytes → AudioSystem frames → ITU μ-law/A-law expansion
    // → integer-exact waveform features, both laws over the same code
    // stream. The oracle re-derives the expansion arithmetically — the
    // G.711 decode is pure integer arithmetic on the code byte, so the
    // codec itself is SQL-expressible.
    Q("ext_mm_audio_g711", {
      val code = "((i*17 + doc_id*7) % 256)"
      def feats(smp: String, sfx: String) =
        s"""CAST(list_max(list_transform($smp, v -> abs(v))) AS INT)
           |   AS peak_$sfx,
           | CAST(len(list_filter(range(1, n), i ->
           |   ($smp[i] < 0) != ($smp[i+1] < 0))) AS BIGINT) AS zc_$sfx,
           | CAST(list_sum(list_transform($smp, v -> v*v)) AS BIGINT)
           |   AS sumsq_$sfx""".stripMargin
      s"""WITH p AS (SELECT doc_id, 100 + doc_id % 40 AS n FROM documents),
         |s AS (SELECT doc_id, n,
         |  list_transform(range(n), i -> ${ulawSql(code)}) AS su,
         |  list_transform(range(n), i -> ${alawSql(code)}) AS sa
         | FROM p)
         |SELECT doc_id, CAST(8 AS INT) AS bits,
         | CAST(8000 AS INT) AS sample_rate,
         | CAST(n AS BIGINT) AS n_samples,
         | ${feats("su", "u")},
         | ${feats("sa", "a")}
         |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val base = documents(s, d).select(col("doc_id"),
        syntheticAu(col("doc_id"), alaw = false).as("pu"),
        syntheticAu(col("doc_id"), alaw = true).as("pa"))
      val u = Multimodal.audioFeatures(
          base.select(col("doc_id"), col("pu")), "pu")
        .select(col("doc_id"), col("audio.bits").as("bits"),
          col("audio.sample_rate").as("sample_rate"),
          col("audio.n_samples").as("n_samples"),
          col("audio.peak").as("peak_u"),
          col("audio.zero_crossings").as("zc_u"),
          col("audio.sumsq").as("sumsq_u"))
      val a = Multimodal.audioFeatures(
          base.select(col("doc_id"), col("pa")), "pa")
        .select(col("doc_id"), col("audio.peak").as("peak_a"),
          col("audio.zero_crossings").as("zc_a"),
          col("audio.sumsq").as("sumsq_a"))
      u.join(a, "doc_id").orderBy(col("doc_id"))
    },

    // The whole real-video path under one hash gate: AVI RIFF bytes →
    // container walk → uncompressed DIB frame decode → per-frame
    // perceptual aHash. The oracle re-derives every frame's pixels and
    // fingerprint bits arithmetically; any error in the RIFF walk, the
    // bottom-up DIB row order, the BGR byte order, or a hash bit
    // position breaks the hash compare.
    Q("ext_mm_video_frames",
      s"""WITH $vidBitsCtes
         |SELECT doc_id, CAST(f AS INT) AS frame_idx,
         | CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
         | ahash_hi, ahash_lo
         |FROM vbits ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      Multimodal.videoFrameHashes(
          documents(s, d).select(col("doc_id"),
            syntheticAvi(col("doc_id")).as("payload")),
          "payload")
        .select(col("doc_id") +: col("frame_idx") +: col("width") +:
          col("height") +:
          hiLo(col("ahash"), "ahash_hi", "ahash_lo"): _*)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Shot-boundary detection over the decoded frames: consecutive
    // per-frame aHash Hamming distances with an is_cut threshold — the
    // one id-partitioned window the plan needs. The oracle joins its
    // re-derived fingerprints on f = f−1.
    Q("ext_mm_video_scenes",
      s"""WITH $vidBitsCtes
         |SELECT a.doc_id, CAST(b.f AS INT) AS frame_idx,
         | CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
         |   + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INT) AS hamming,
         | CAST(CASE WHEN bit_count(xor(a.ahash_hi, b.ahash_hi))
         |   + bit_count(xor(a.ahash_lo, b.ahash_lo)) > 10
         |   THEN 1 ELSE 0 END AS INT) AS is_cut
         |FROM vbits a JOIN vbits b
         |  ON b.doc_id = a.doc_id AND b.f = a.f + 1
         |ORDER BY a.doc_id, frame_idx""".stripMargin) { (s, d) =>
      val frames = Multimodal.videoFrameHashes(
        documents(s, d).select(col("doc_id"),
          syntheticAvi(col("doc_id")).as("payload")),
        "payload")
      Multimodal.sceneCuts(frames, "doc_id", "frame_idx", "ahash",
          threshold = 10)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // MPEG-1 Layer III header walk: each doc synthesizes a valid MP3
    // frame stream (3–7 frames; CBR at 128 kbps or VBR cycling
    // 128/160/192; sample rate from {44100, 48000, 32000}; alternating
    // padding bits) whose real bytes the engine hops frame-by-frame —
    // any error in the sync check, the bitrate/rate tables, the
    // ⌊144000·kbps/rate⌋+pad frame length, or the 1152-samples-per-
    // frame duration breaks the hash compare against the oracle's
    // arithmetic re-derivation.
    Q("ext_mm_mp3",
      s"""WITH p AS (SELECT doc_id, 3 + doc_id % 5 AS nf,
         |   doc_id % 3 AS sri, doc_id % 2 AS isvbr FROM documents),
         |r AS (SELECT *, CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000
         |   ELSE 32000 END AS rate FROM p),
         |b AS (SELECT doc_id, nf, rate,
         |   list_transform(range(nf), f -> CASE WHEN isvbr = 1 THEN
         |     CASE ((doc_id + f) % 3) WHEN 0 THEN 128 WHEN 1 THEN 160
         |       ELSE 192 END ELSE 128 END) AS brs FROM r)
         |SELECT doc_id, CAST(nf AS INT) AS n_frames,
         | CAST(rate AS INT) AS sample_rate,
         | CAST(list_min(brs) AS INT) AS bitrate_min,
         | CAST(list_max(brs) AS INT) AS bitrate_max,
         | CAST(nf * 1152000 // rate AS BIGINT) AS duration_ms,
         | list_min(brs) != list_max(brs) AS vbr
         |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.mp3Features(
          documents(s, d).select(col("doc_id"),
            syntheticMp3(col("doc_id")).as("payload")),
          "payload")
        .select(col("doc_id"),
          col("mp3.n_frames").as("n_frames"),
          col("mp3.sample_rate").as("sample_rate"),
          col("mp3.bitrate_min").as("bitrate_min"),
          col("mp3.bitrate_max").as("bitrate_max"),
          col("mp3.duration_ms").as("duration_ms"),
          col("mp3.vbr").as("vbr"))
        .orderBy(col("doc_id"))
    })
}
