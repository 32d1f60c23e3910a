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
