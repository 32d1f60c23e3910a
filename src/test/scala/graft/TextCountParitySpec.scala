package graft

import graft.functions.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The r13 single-pass byte-scan counters ([[graft.plans.TextScan]])
  * replaced the regex counters the text family was built on, while the
  * DuckDB oracle keeps replaying the REGEX forms — so the two must
  * count identically on every input. This spec pins the equivalence
  * against `regexp_count` itself (Spark's regex engine, same `\b`/`\s`
  * ASCII semantics as DuckDB's RE2 — the oracle hash rows check the
  * cross-engine leg) on adversarial cases, seeded random strings, and
  * the real test corpus.
  */
class TextCountParitySpec extends SparkSuite {
  import spark.implicits._

  private def regexTokens(t: Column) = regexp_count(t, lit("\\S+")).cast("long")
  private def regexPunct(t: Column) =
    regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("long")
  private def regexSubword(t: Column) =
    regexp_count(t, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")
  private def regexUpper(t: Column) = regexp_count(t, lit("[A-Z]")).cast("long")
  private def regexLang(t: Column, lang: String) =
    regexp_count(lower(t), lit("\\b(?:" +
      TextAnalysis.stopwords.toMap.apply(lang).mkString("|") + ")\\b")).cast("long")

  /** `withLang = false` skips the `\b` dictionary comparisons: Java's
    * `\b` is UNICODE-aware even in default mode (a non-ASCII letter
    * next to a stopword suppresses the boundary) while DuckDB's RE2
    * `\b` — the engine the ORACLE replays — is ASCII like the scan.
    * The scan deliberately implements the RE2/ASCII semantics, so on
    * inputs with a non-ASCII char ADJACENT to a word-char run the scan
    * agrees with DuckDB and (correctly) disagrees with Java regex; a
    * dedicated test below pins that choice.
    */
  private def assertParity(texts: Seq[String], label: String,
      withLang: Boolean = true): Unit = {
    val df = texts.toDF("text")
    val cols = Seq(
      ("token", TextAnalysis.tokenCount(col("text")), regexTokens(col("text"))),
      ("punct", TextAnalysis.punctCount(col("text")), regexPunct(col("text"))),
      ("subword", TextAnalysis.subwordCount(col("text")), regexSubword(col("text"))),
      ("upper", TextAnalysis.upperCount(col("text")), regexUpper(col("text")))) ++
      (if (withLang) TextAnalysis.stopwords.map { case (l, _) =>
        (s"lang:$l", TextAnalysis.langScore(col("text"), l), regexLang(col("text"), l))
      } else Seq.empty)
    val selected = df.select(col("text") +: cols.flatMap { case (_, a, b) =>
      Seq(a, b) }: _*).collect()
    selected.foreach { r =>
      cols.zipWithIndex.foreach { case ((name, _, _), i) =>
        assert(r.getLong(1 + 2 * i) == r.getLong(2 + 2 * i),
          s"$label/$name diverges on ${r.getString(0).take(120).replace("\n", "\\n")}: " +
            s"scan=${r.getLong(1 + 2 * i)} regex=${r.getLong(2 + 2 * i)}")
      }
    }
  }

  /** A non-ASCII letter adjacent to a word run is where the engines
    * disagree by design: Java `\b` (Unicode) sees no boundary; RE2 —
    * what DuckDB's oracle replays — and the scan (ASCII) see one. The
    * scan must side with the oracle.
    */
  test("scan \\b follows RE2/DuckDB ASCII semantics where Java \\b is Unicode") {
    val cases = Seq("Éthe" -> 1L, "éthe und" -> 2L, "théé" -> 0L, "café the" -> 1L)
    val df = cases.map(_._1).toDF("text")
    val got = df.select(col("text"),
      TextAnalysis.langScore(col("text"), "en")
        + TextAnalysis.langScore(col("text"), "de")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { case (t, want) => assert(got(t) == want, s"on '$t'") }
    // ... and Java regex indeed disagrees on the first (the latent
    // pre-r13 cross-engine divergence this change CLOSES)
    val j = df.select(col("text"), regexLang(col("text"), "en")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(j("Éthe") == 0L)
  }

  test("scan counters match regexp_count on adversarial inputs") {
    assertParity(Seq(
      "", " ", "the", " the ", "the the the", "THE The tHe",
      "theory", "lathe", "the1", "1the", "the_", "_the", "x_the_y",
      "the-and", "the,and.of", "the\tand\nofto\fis\ris",
      "ein DER nicht", "el los QUE por", "le la EST que",
      "0123456789", "a1b2c3", "___", "__the__",
      "und", // 'und' is a de stopword and the langId sentinel string
      "The quick brown fox jumps over the lazy dog, and that is it.",
      "word " * 500 + "the", "the|and", "(?:the)", "\\bthe\\b"),
      "adversarial")
    // inputs with a non-ASCII char ADJACENT to word chars: the
    // char-class counters still agree with Java regex exactly; the
    // \b dictionary counters follow RE2 instead (dedicated test above)
    assertParity(Seq(
      "a\u00a0the\u00a0and b", // NBSP is punct, not \s, in both engines
      "caf\u00e9 the na\u00efve und", "\u00c9the", "\u00e9the",
      "\u65e5\u672c\u8a9e the \u4e2d\u6587", "\ud83d\ude42the\ud83d\ude42 and", "the\ud83d\ude42and",
      "\u591a\u5b57\u8282the\u5b57"), "adversarial-nonascii", withLang = false)
  }

  test("scan counters match regexp_count on seeded random strings") {
    val rng = new scala.util.Random(20260815L)
    // ASCII pool: FULL parity including the \b dictionary counters
    val ascii = "abcdefgzTHE _\t\n,.!?0159-_|()" +
      "theandoftoisinthatit" // bias toward stopword fragments
    val asciiTexts = (1 to 300).map { _ =>
      val len = rng.nextInt(400)
      (0 until len).map(_ => ascii(rng.nextInt(ascii.length))).mkString
    } ++ (1 to 100).map { _ =>
      // token-structured strings: runs of stopwords/near-misses
      val words = Seq("the", "thee", "th", "and", "und", "is", "is1",
        "que", "q_ue", "la", "el", "ist", "nicht", "NICHT")
      (0 until rng.nextInt(60)).map(_ => words(rng.nextInt(words.length)))
        .mkString(Seq(" ", "  ", ",", "-", "\n")(rng.nextInt(5)))
    }
    assertParity(asciiTexts, "random-ascii")
    // mixed pool with multi-byte chars: char-class counters only (the
    // \b semantics split is pinned by the RE2-vs-Java test above)
    val mixed = ascii + "é日中"
    val mixedTexts = (1 to 200).map { _ =>
      val len = rng.nextInt(300)
      (0 until len).map(_ => mixed(rng.nextInt(mixed.length))).mkString
    }
    assertParity(mixedTexts, "random-mixed", withLang = false)
  }

  test("scan counters match regexp_count on the real document corpus") {
    val docs = Tables.documents(spark, sf001).select(col("text"))
      .as[String].collect().toSeq
    assert(docs.nonEmpty)
    assertParity(docs, "corpus")
  }

  /** r15: [[graft.plans.TermFrequencies]] must reproduce the
    * explode(regexp_extract_all)+groupBy pipeline row-for-row — same
    * terms (UTF-8 byte equality), same counts, per document. The
    * per-doc total fold must equal SUM(c).
    */
  test("termFrequencies equals explode(regexp_extract_all)+groupBy, and its fold equals the sum") {
    val texts = Seq(
      "", " ", "the the the", "a b a b a", "x", " lead trail ",
      "the\tand\nofto\fis\ris", "a b a b", "café café cafe",
      "日本語 the 日本語", "🙂 🙂 y",
      "dup  dup   dup", "_ _ __ _", "vtabvtab",
      "word " * 300 + "tail") ++ {
      val rng = new scala.util.Random(20260815L)
      val pool = "ab \t\né日 _"
      (1 to 150).map { _ =>
        (0 until rng.nextInt(120)).map(_ => pool(rng.nextInt(pool.length))).mkString
      }
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = df.select(col("doc_id"),
      graft.plans.GraftFunctions.termFrequencies(col("text")).as("tf"))
      .select(col("doc_id"),
        aggregate(col("tf"), lit(0L), (acc, x) => acc + x.getField("c")).as("m"),
        explode(col("tf")).as("e"))
      .select(col("doc_id"), col("e.term"), col("e.c"), col("m"))
      .as[(Long, String, Long, Long)].collect()
    val spec = df.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("c"))
      .as[(Long, String, Long)].collect()
    assert(fast.map(r => (r._1, r._2, r._3)).toSet == spec.toSet,
      s"term/count mismatch: fast=${fast.length} spec=${spec.length}")
    val specTotals = spec.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).sum }
    fast.groupBy(_._1).foreach { case (d, rs) =>
      assert(rs.map(_._4).toSet.size == 1 && rs.head._4 == specTotals(d),
        s"per-doc fold total mismatch for doc $d")
    }
    // non-string input fails at analysis like the other scan expressions
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.plans.GraftFunctions.termFrequencies(col("doc_id"))).collect()
    }
    assert(e.getMessage.contains("DATATYPE_MISMATCH")
      || e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  /** r13 advice: the scan counters declare string input
    * (ExpectsInputTypes), so a non-string column fails at ANALYSIS with
    * a typed DATATYPE_MISMATCH (under ANSI coercion an int does not
    * implicitly cast to string) — not a per-row ClassCastException at
    * execution. An explicit cast stays available and matches the regex
    * form.
    */
  test("non-string input fails at analysis; explicit cast matches regexp_count") {
    val df = Seq(12345, -7, 0).toDF("n")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TextAnalysis.tokenCount(col("n"))).collect()
    }
    assert(err.getMessage.contains("DATATYPE_MISMATCH"))
    val got = df.select(
      TextAnalysis.tokenCount(col("n").cast("string")),
      regexTokens(col("n").cast("string")),
      TextAnalysis.punctCount(col("n").cast("string")),
      regexPunct(col("n").cast("string"))).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }
}
