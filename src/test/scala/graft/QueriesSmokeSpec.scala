package graft

/** Smoke: flagship entry + every declared query yields a readable plan
  * and runs at sf0.001; every oracle key has a matching query.
  */
class QueriesSmokeSpec extends SparkSuite {

  test("entry() returns a non-empty validation report") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("tx_surprisal: rare-token docs score higher, common-token docs lower") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("surprisal").toString
    // "the" dominates the corpus; doc 3 holds corpus-unique tokens
    Seq(
      (1L, "the the the the", "a"),
      (2L, "the the the cat", "a"),
      (3L, "zq xv bw yk", "a"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesExt.txSurprisal(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(_._2) == Seq(4L, 4L, 4L))
    val byDoc = got.map(g => g._1 -> g._3).toMap
    // inverse probability: common "the" → low, unique tokens → high (= tot)
    assert(byDoc(1L) < byDoc(2L) && byDoc(2L) < byDoc(3L), s"got $byDoc")
    assert(byDoc(3L) == 12.0, s"unique-token doc should score tot=12, got ${byDoc(3L)}")
  }

  test("tx_surprisal edges: empty/null-text docs drop, single-token doc scores tot/n") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("surprisal_edge").toString
    Seq(
      (1L, "hello hello world", "a"),
      (2L, "", "a"),              // zero tokens -> no output row
      (3L, null: String, "a"),    // null text -> no output row
      (4L, "hello", "a"))         // single token
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesExt.txSurprisal(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == Seq(1L, 4L), s"empty/null docs must drop: $got")
    // corpus: hello x3, world x1, tot = 4
    // doc 1: (2*(4/3) + 1*(4/1)) / 3 ; doc 4: (1*(4/3)) / 1
    val d1 = (2.0 * (4.0 / 3.0) + 1.0 * (4.0 / 1.0)) / 3.0
    val d4 = 4.0 / 3.0
    val byDoc = got.map(g => g._1 -> g._3).toMap
    assert(byDoc(1L) == d1 && byDoc(4L) == d4, s"got $byDoc expected ($d1, $d4)")
    assert(got.map(_._2) == Seq(3L, 1L))
  }

  test("cu_temperature_sample: alpha=1/2 flattens without equalizing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tempsample").toString
    // source a: 90% of tokens, source b: 10% — alpha=1/2 targets
    // sqrt(.9)/(sqrt(.9)+sqrt(.1)) ~= 0.75 of tokens for a
    val docs = (1L to 90L).map(i => (i, "w " * 10, "a")) ++
      (91L to 100L).map(i => (i, "w " * 10, "b"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rates = QueriesExt.cuTemperatureSample(spark, dir)
      .select("source", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wa = math.sqrt(0.9); val wb = math.sqrt(0.1)
    val expA = (wa / (wa + wb)) / 0.9  // target share / current share
    assert(math.abs(rates("a") - expA) < 1e-12, s"got $rates expected a=$expA")
    assert(rates("b") == 1.0, s"under-represented source must keep all: $rates")
    // flattened, not equalized: a's rate above the equalize rate (1/(2*.9))
    assert(rates("a") > 1.0 / (2 * 0.9) && rates("a") < 1.0)
  }

  test("cu_temperature_sample alpha grid: smaller alpha flattens harder; " +
      "composed-sqrt weights are the exact IEEE ops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tempgrid").toString
    val docs = (1L to 90L).map(i => (i, "w " * 10, "a")) ++
      (91L to 100L).map(i => (i, "w " * 10, "b"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rateA(q: Queries.Q): Double =
      q(spark, dir).select("source", "rate").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap.apply("a")
    // the same op sequences the Column expressions run, including the
    // left-associated rate chain w/wsum*tot/st — exact equality, no eps
    val (p, pB) = (900.0 / 1000.0, 100.0 / 1000.0)
    def w25(x: Double) = math.sqrt(math.sqrt(x))
    def w50(x: Double) = math.sqrt(x)
    def w75(x: Double) = math.sqrt(x) * math.sqrt(math.sqrt(x))
    def rate(w: Double => Double): Double = w(p) / (w(p) + w(pB)) * 1000.0 / 900.0
    val r25 = rateA(QueriesExt.cuTemperatureSampleA25)
    val r50 = rateA(QueriesExt.cuTemperatureSample)
    val r75 = rateA(QueriesExt.cuTemperatureSampleA75)
    assert(r25 == rate(w25))
    assert(r50 == rate(w50))
    assert(r75 == rate(w75))
    // alpha orders the flattening: smaller alpha -> flatter mixture ->
    // lower keep rate for the over-represented source
    assert(r25 < r50 && r50 < r75 && r75 < 1.0, s"got $r25 $r50 $r75")
  }

  test("cu_temperature_sample: zero-token source keeps all at rate 1.0 (specified, not NaN)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tempzero").toString
    (Seq((1L, "w w w w", "a"), (2L, "w w", "a")) ++
      Seq((3L, "", "z"), (4L, "", "z")))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesExt.cuTemperatureSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    val z = got.filter(_._2 == "z")
    assert(z.map(_._1).toSet == Set(3L, 4L), s"zero-token docs must all keep: $got")
    assert(z.forall(_._3 == 1.0), s"zero-token source rate must be exactly 1.0: $z")
  }

  test("subword token currency: punct/digit-dense text counts higher than whitespace") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("subcur").toString
    Seq((1L, "plain words here", "en", "a"),
        (2L, "f(x)=3.14*y;", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ws = QueriesExt.cuPack(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sw = QueriesExt.cuPackSubword(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ws(1L) == 3L && sw(1L) == 3L)        // plain prose: currencies agree
    // "f(x)=3.14*y;" -> f ( x ) = 3 . 1 4 * y ; = 12 subwords, 1 \S+ run
    assert(ws(2L) == 1L && sw(2L) == 12L, s"got ws=$ws sw=$sw")
    // the mix the two currencies report differs exactly where it should
    val mixW = QueriesExt.cuTokenMix(spark, dir).collect().head.getLong(3)
    val mixS = QueriesExt.cuTokenMixSubword(spark, dir).collect().head.getLong(3)
    assert(mixW == 4L && mixS == 15L)
  }

  test("tx_gopher_quality: each rule gates the doc crafted to fail it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val good = "the cat sat with all of and that have " + fifty
    Seq(
      (1L, good),                                        // passes all
      (2L, "the of and " + (1 to 10).map(i => s"w$i").mkString(" ")), // too few words
      (3L, good.replaceAll("\\bword(\\d+)\\b", "ww")),   // mean len < 3
      (4L, good + " " + (1 to 12).map(_ => "#").mkString(" ")), // symbols > 0.1
      (5L, good + " " + (1 to 99).map(_ => "123").mkString(" ")), // alpha < 0.8
      (6L, fifty + " " + fifty))                         // no stopwords
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesExt.txGopherQuality(spark, dir)
      .select("doc_id", "r_word_count", "r_mean_len", "r_symbols", "r_alpha",
        "r_stopwords", "pass")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got(1L) == ((true, true, true, true, true, true)), s"got ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._6, s"word-count gate: ${got(2L)}")
    assert(!got(3L)._2 && !got(3L)._6, s"mean-len gate: ${got(3L)}")
    assert(!got(4L)._3 && !got(4L)._6, s"symbol gate: ${got(4L)}")
    assert(!got(5L)._4 && !got(5L)._6, s"alpha gate: ${got(5L)}")
    assert(!got(6L)._5 && !got(6L)._6, s"stopword gate: ${got(6L)}")
  }

  test("cu_budget_select: greedy best-first under the per-lang token budget") {
    val rows = QueriesExt.cuBudgetSelect(spark, sf001)
      .select("lang", "quality", "doc_id", "n_tokens", "selected")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val sel = docs.filter(_._5)
      val rej = docs.filterNot(_._5)
      // budget respected
      assert(sel.map(_._4).sum <= QueriesExt.SelectBudgetTokens,
        s"$lang over budget: ${sel.map(_._4).sum}")
      // greedy best-first: every selected doc ranks (quality desc, id asc)
      // before every rejected doc
      if (sel.nonEmpty && rej.nonEmpty) {
        val worstSel = sel.map(d => (-d._2, d._3)).max
        val bestRej = rej.map(d => (-d._2, d._3)).min
        assert(worstSel._1 <= bestRej._1 ||
          (worstSel._1 == bestRej._1 && worstSel._2 < bestRej._2),
          s"$lang not best-first: worst selected $worstSel vs best rejected $bestRej")
      }
      // prefix-maximality: the first rejected doc (in rank order) is
      // rejected exactly because it would overflow the running budget
      rej.sortBy(d => (-d._2, d._3)).headOption.foreach { b =>
        assert(sel.map(_._4).sum + b._4 > QueriesExt.SelectBudgetTokens,
          s"$lang rejected a doc that still fit: $b")
      }
    }
  }

  test("all queries run at sf0.001 and are non-degenerate") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf001).count()
    }
    val empties = counts.filter(_._2 == 0).keys.toSeq.sorted
    // x1_except may legitimately be empty at tiny SF; nothing else should
    assert(empties.forall(Set("x1_except", "sim_cosine_neardup", "dd_minhash_lsh")),
      s"unexpected empty results: $empties")
  }
}
