package graft

import graft.catalog.TypeMapper
import graft.functions.Conversions
import graft.plans.Hash64
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws for the conversion layer (SURVEY §5 test plan
  * item (e)): zero-date nulling, NUL-strip idempotence, COPY-escape
  * reversibility, TypeMapper totality, hash determinism.
  *
  * Spark-evaluated properties batch all samples into one DataFrame per
  * law (one job per law, not per sample).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val asciiGen: Gen[String] =
    Gen.listOf(Gen.choose(0, 127).map(_.toChar)).map(_.mkString.take(200))

  test("TypeMapper is total: never throws on arbitrary type strings") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.option(Gen.choose(1, 64))) { (base, p) =>
      val t = p.map(n => s"$base($n)").getOrElse(base)
      TypeMapper.toSparkType(t) != null
    })
  }

  test("NUL strip removes every NUL and is idempotent (batched)") {
    val samples = Gen.listOfN(200, asciiGen).sample.get
    val once = samples.toDF("s").select(Conversions.stripNul($"s").as("s"))
    val got = once.as[String].collect()
    assert(got.forall(!_.contains("\u0000")))
    val twice = got.toSeq.toDF("s").select(Conversions.stripNul($"s")).as[String].collect()
    assert(twice.toSeq == got.toSeq)
  }

  test("COPY escape emits no raw control chars and reverses (batched)") {
    val samples = Gen.listOfN(200, asciiGen).sample.get
    val out = samples.toDF("s").select($"s", Conversions.copyEscape($"s").as("e"))
      .as[(String, String)].collect()
    out.foreach { case (orig, esc) =>
      assert(!esc.exists(c => c == '\n' || c == '\r' || c == '\t'))
      val restored = new StringBuilder
      var i = 0
      while (i < esc.length) {
        if (esc(i) == '\\' && i + 1 < esc.length) {
          esc(i + 1) match {
            case 'n' => restored += '\n'; case 'r' => restored += '\r'
            case 't' => restored += '\t'; case '\\' => restored += '\\'
            case other => restored += '\\' += other
          }
          i += 2
        } else { restored += esc(i); i += 1 }
      }
      assert(restored.toString == orig, s"roundtrip failed for ${orig.map(_.toInt)}")
    }
  }

  test("zero-date conversion: zero-dates null, sane dates preserved (batched)") {
    val dates = (1 to 100).map { i =>
      f"${1970 + i % 130}%04d-${1 + i % 12}%02d-${1 + i % 28}%02d"
    }
    val rows = dates.flatMap(d => Seq(d, s"0000-00-00 $d"))
    val got = rows.toDF("s").select(Conversions.zeroDateToNull($"s")).collect()
    rows.zip(got).foreach { case (in, r) =>
      if (in.startsWith("0000-00-00")) assert(r.isNullAt(0))
      else assert(r.getString(0) == in)
    }
  }

  test("fused shingle hashing equals the composed form on arbitrary unicode (batched)") {
    // arbitrary code points incl. multibyte and astral-plane (surrogate
    // pairs); both paths consume the same UTF8String value, so parity
    // must hold for every input, not just ASCII
    val charGen = Gen.frequency(
      4 -> Gen.choose(32, 126).map(_.toChar.toString),
      2 -> Gen.choose(0xA0, 0x2FFF).map(i => new String(Character.toChars(i))),
      1 -> Gen.choose(0x10000, 0x10FFF).map(i => new String(Character.toChars(i))))
    val strGen = Gen.listOf(charGen).map(_.mkString.take(120))
    // deterministic seeds: a flaky unseeded sample can neither be
    // reproduced nor bisected; five fixed seeds × 150 strings
    val samples = (1L to 5L).flatMap { s =>
      Gen.listOfN(150, strGen)(Gen.Parameters.default,
        org.scalacheck.rng.Seed(s)).getOrElse(Nil)
    }
    for ((n, stride) <- Seq((8, 1), (5, 2))) {
      val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val fused = df.select($"id",
        graft.plans.GraftFunctions.hashedCharShingles($"t", n, stride).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val composed = df.select($"id",
        graft.plans.GraftFunctions.hashedShingleSet(
          graft.functions.TextAnalysis.charShingles($"t", n, stride)).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val diff = (fused.keySet ++ composed.keySet)
        .filter(k => fused.get(k) != composed.get(k))
      assert(diff.isEmpty,
        s"divergence at n=$n stride=$stride on ids $diff: " +
          diff.take(2).map(k => s"'${samples(k.toInt)}' fused=${fused.get(k)} composed=${composed.get(k)}").mkString("; "))
    }
  }

  test("TokenGramHashes equals the naive tokenize->hash->poly reference (batched)") {
    // the single-pass byte scan (token boundaries, per-token KR,
    // rolling de-roll) against a direct reimplementation from the
    // regex tokenizer — arbitrary ASCII incl. leading/trailing/multi
    // whitespace, short docs, k-boundary lengths
    val k = 4
    def reference(s: String): Seq[Long] = {
      val B = 0x100000001b3L
      val th = "\\S+".r.findAllIn(s).toArray.map { t =>
        Hash64.splitmix64(
          t.getBytes("UTF-8").foldLeft(0L)((h, b) => h * B + (b & 0xffL)))
      }
      (0 to th.length - k).map { p =>
        Hash64.splitmix64(
          (0 until k).foldLeft(0L)((g, j) => g * B + th(p + j)))
      }
    }
    val wsGen = Gen.listOf(Gen.frequency(
      6 -> Gen.choose(33, 126).map(_.toChar),
      2 -> Gen.const(' '), 1 -> Gen.const('\t'), 1 -> Gen.const('\n')))
      .map(_.mkString.take(120))
    check(Prop.forAll(Gen.listOfN(20, wsGen)) { texts =>
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select($"id", graft.plans.GraftFunctions.tokenGramHashes($"text", k).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      texts.zipWithIndex.forall { case (t, i) => got(i.toLong) == reference(t) }
    })
  }

  test("Hash64 is deterministic, seed-sensitive, well-spread") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.long) { (s, seed) =>
      Hash64.utf8(UTF8String.fromString(s), seed) ==
        Hash64.utf8(UTF8String.fromString(s), seed)
    })
    // different seeds disagree somewhere
    val vals = (0L until 64L).map(seed => Hash64.utf8(UTF8String.fromString("x"), seed))
    assert(vals.distinct.size > 60)
  }
}
