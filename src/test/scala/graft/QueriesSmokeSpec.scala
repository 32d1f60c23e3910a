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
