package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Mp3Spec extends SparkSpec {
  import spark.implicits._

  /** One MPEG-1 Layer III frame: header + zero payload. */
  private def frame(briIdx: Int, sriIdx: Int, pad: Int): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(briIdx)
    val rate = Array(44100, 48000, 32000)(sriIdx)
    val len = 144000 * kbps / rate + pad
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte
    b(2) = ((briIdx << 4) | (sriIdx << 2) | (pad << 1)).toByte
    b(3) = 0
    b
  }

  test("mp3Info parses a CBR stream: frames, rate, duration, no vbr") {
    val bytes = Array.fill(4)(frame(9, 0, 0)).flatten // 4x 128kbps@44100
    val r = Multimodal.mp3Info(bytes).get
    assert(r.getInt(0) === 4) // n_frames
    assert(r.getInt(1) === 44100)
    assert(r.getInt(2) === 128 && r.getInt(3) === 128)
    assert(r.getLong(4) === 4L * 1152000L / 44100L) // duration_ms
    assert(r.getBoolean(5) === false)
  }

  test("mp3Info detects VBR and padding-varied frame lengths") {
    val bytes = (frame(9, 2, 0) ++ frame(11, 2, 1) ++ frame(10, 2, 0))
    val r = Multimodal.mp3Info(bytes).get
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 32000)
    assert(r.getInt(2) === 128 && r.getInt(3) === 192)
    assert(r.getBoolean(5) === true)
  }

  test("mp3Info rejects truncated, tagged, and mixed-rate streams") {
    val good = frame(9, 0, 0)
    assert(Multimodal.mp3Info(good.dropRight(1)).isEmpty) // truncated
    val id3 = "ID3".getBytes ++ good // leading tag
    assert(Multimodal.mp3Info(id3).isEmpty)
    val mixed = frame(9, 0, 0) ++ frame(9, 1, 0) // 44100 then 48000
    assert(Multimodal.mp3Info(mixed).isEmpty)
    assert(Multimodal.mp3Info(Array.emptyByteArray).isEmpty)
    assert(Multimodal.mp3Info("not audio at all".getBytes).isEmpty)
  }

  test("mp3Features maps a binary column; non-MP3 rows get null struct") {
    val df = Seq(
      (1L, Array.fill(2)(frame(9, 1, 0)).flatten),
      (2L, "garbage".getBytes)
    ).toDF("id", "payload")
    val out = Multimodal.mp3Features(df, "payload")
      .select(col("id"), col("mp3.n_frames").as("nf"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out === Map(1L -> 2, 2L -> -1))
  }
}
