package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world this is payload one".getBytes("UTF-8")),
    (2L, Array.empty[Byte]),
    (3L, Array.fill[Byte](1000)(65))
  ).toDF("doc_id", "payload")

  test("extractFeatures runs per-partition and emits the typed schema") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(media, "doc_id", "payload")
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getDouble(5))).toMap
    assert(rows(1L)._1 == 31L)
    assert(rows(2L)._1 == 0L && rows(2L)._3 == 0.0)
    assert(rows(3L)._1 == 1000L && math.abs(rows(3L)._3 - 65.0 / 255) < 1e-12)
    // checksum is the real sha256 of the payload
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("hello world this is payload one".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(1L)._2 == expected)
  }

  test("decodeStub is deterministic") {
    val a = Multimodal.decodeStub("abc".getBytes)
    assert(a == Multimodal.decodeStub("abc".getBytes))
  }

  test("frameSample takes every Nth byte") {
    val df = Seq((1L, "abcdefghij".getBytes("UTF-8"))).toDF("id", "payload")
    val got = Multimodal.frameSample(df, "payload", 3)
      .select("sample").as[Array[Byte]].head()
    assert(new String(got, "UTF-8") == "adgj")
  }

  test("frameSample is byte-safe on non-UTF-8 media bytes") {
    // real media payloads are NOT valid UTF-8 — every byte value 0-255,
    // including lone continuation bytes, must survive the stride
    val raw = Array.tabulate[Byte](256)(i => i.toByte)
    val df = Seq((1L, raw)).toDF("id", "payload")
    val got = Multimodal.frameSample(df, "payload", 4)
      .select("sample").as[Array[Byte]].head()
    assert(got.toSeq == raw.grouped(4).map(_.head).toSeq,
      "stride over raw bytes corrupted the payload")
  }

  test("mediaDims parses real PNG and GIF headers declaratively") {
    // minimal real headers: PNG signature + IHDR(640x480), GIF89a 320x200
    def be4(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13) ++ "IHDR".getBytes ++ be4(640) ++ be4(480) ++ Array[Byte](8, 2, 0, 0, 0)
    val gif = "GIF89a".getBytes ++ Array[Byte]((320 & 0xFF).toByte, (320 >> 8).toByte,
      (200 & 0xFF).toByte, (200 >> 8).toByte, 0, 0, 0)
    val junk = "not an image at all".getBytes
    val df = Seq((1L, png), (2L, gif), (3L, junk)).toDF("id", "payload")
    val got = Multimodal.mediaDims(df, "payload")
      .select("id", "media_format", "media_width", "media_height")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == (("png", Some(640), Some(480))))
    assert(got(2L) == (("gif", Some(320), Some(200))))
    assert(got(3L) == (("unknown", None, None)))
  }
}
