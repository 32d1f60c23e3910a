package graft

import graft.functions.TextAnalysis
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("one two  three", "", "  ", "a-b c3 !").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.subwordCount($"text")).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((3L, 3L), (0L, 0L), (0L, 0L), (3L, 6L)))
  }

  test("language id picks the dominant stopword language") {
    val df = Seq(
      "the cat and the dog is in the house",
      "der hund und die katze ist nicht ein problem zu",
      "xyzzy qwerty plugh").toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
  }

  test("quality score stays in [0,1] and favors real text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and that is it in the end " * 8,
      "!!!! #### $$$$ %%%%").toDF("text")
    val got = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1))
  }

  test("char shingles with stride and short-text edge") {
    val df = Seq("abcdef", "ab").toDF("text")
    val got = df.select(TextAnalysis.charShingles($"text", 4, 2)).as[Seq[String]].collect()
    assert(got(0) == Seq("abcd", "cdef"))
    assert(got(1).isEmpty)
  }

  test("word shingles") {
    val df = Seq("a b c d").toDF("text")
    val got = df.select(TextAnalysis.wordShingles($"text", 2)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b c", "c d"))
  }

  test("fingerprint is stable and 16 hex chars") {
    val df = Seq("hello", "hello", "world").toDF("text")
    val got = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(got(0) == got(1) && got(0) != got(2) && got(0).matches("[0-9a-f]{16}"))
  }

  test("multimodal: stub feature extraction is deterministic with right shape") {
    val media = Seq((1L, "image", "payload-bytes-1"), (2L, "image", "payload-bytes-2"))
      .toDF("media_id", "kind", "s")
      .select($"media_id", $"kind", $"s".cast("binary").as("payload"))
    val f1 = Multimodal.extractFeatures(media, nFeatures = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media, nFeatures = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2)
    assert(f1(1L).length == 8 && f1(1L) != f1(2L))
    assert(f1.values.flatten.forall(v => v >= 0f && v <= 1f))
  }

  test("multimodal: payload stats and frame sampling") {
    val media = Seq((1L, "video", "0123456789", 25), (2L, "image", "ab", 1))
      .toDF("media_id", "kind", "s", "nf")
      .select($"media_id", $"kind", $"s".cast("binary").as("payload"),
        struct(lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"),
          $"nf".as("n_frames"), lit("m").as("mime")).as("meta"))
    val stats = Multimodal.payloadStats(media).orderBy("media_id").collect()
    assert(stats(0).getAs[Long]("n_bytes") == 10L)
    val frames = Multimodal.sampleFrames(media, stride = 10)
      .as[(Long, Int)].collect().toSeq
    assert(frames == Seq((1L, 0), (1L, 10), (1L, 20)))
  }

  test("StubCodec resize and frame positions") {
    assert(Multimodal.StubCodec.resize(Array[Byte](1, 2, 3, 4), 2).toSeq == Seq[Byte](1, 2))
    assert(Multimodal.StubCodec.framePositions(7, 3).toSeq == Seq(0, 3, 6))
  }

  test("multimodal: resizeMedia rewrites dims, pads/truncates, passes audio through") {
    val media = Seq(
      (1L, "video", "0123456789abcdef"), // 16 bytes -> truncated to 12
      (2L, "image", "xy"),               // 2 bytes  -> zero-padded to 12
      (3L, "audio", "wav-bytes"))        // untouched
      .toDF("media_id", "kind", "s")
      .select($"media_id", $"kind", $"s".cast("binary").as("payload"),
        struct(lit(100).as("width"), lit(50).as("height"), lit(44100).as("sample_rate"),
          lit(1).as("n_frames"), lit("m").as("mime")).as("meta"))
    val out = Multimodal.resizeMedia(media, 2, 2) // 2*2*3 = 12 target bytes
      .select($"media_id", $"kind", $"payload", $"meta.width", $"meta.height",
        $"meta.sample_rate")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Array[Byte]](2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    assert(out(1L)._2.toSeq == "0123456789ab".getBytes.toSeq && out(1L)._3 == 2)
    assert(out(2L)._2.length == 12 && out(2L)._2.drop(2).forall(_ == 0) && out(2L)._4 == 2)
    assert(out(3L)._2.toSeq == "wav-bytes".getBytes.toSeq
      && out(3L)._3 == 100 && out(3L)._4 == 50) // audio untouched
    assert(out(1L)._5 == 44100) // non-dim meta preserved
  }
}

class WinnowSpec extends SparkSuite {
  import graft.functions.TextAnalysis
  import spark.implicits._

  test("winnowing: shared long substrings share fingerprints; short texts handled") {
    val common = "the identical stretch of text that both documents contain verbatim"
    val df = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"completely different opening $common and another tail"),
      (3L, "nothing in common with the others at all here"),
      (4L, "tiny")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextAnalysis.winnowFingerprints($"text", 8, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty) // shared substring -> shared fp
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty)
    assert(fps(4L).isEmpty) // shorter than k
    // deterministic
    val again = df.select($"doc_id", TextAnalysis.winnowFingerprints($"text", 8, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(again == fps)
  }
}
