package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The harness captures only the last ~2000 chars of the build log and
  * sbt appends its own "[success]" line after our output — rounds 6/7
  * shipped `parsed: null` because the full per-query JSON line (~3.5 KB)
  * lost its head to the tail buffer. These tests pin the compact stdout
  * line's contract: valid JSON, within budget, headline queries present.
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  // a synthetic surface larger than the real one, with worst-case long names
  private val results: Seq[(String, Double)] =
    (1 to 120).map(i => (f"cu_decontaminate_family_q$i%03d", i * 0.037)) ++
      Seq("v0_validation_suite" -> 0.79, "a2_distinct_pk" -> 0.21,
        "j1_anti_join" -> 0.26, "s2_snap_load" -> 0.12,
        "s7_cdc_upsert_apply" -> 0.47, "q1_agg" -> 0.24,
        "w1_latest_per_key" -> 0.20, "t3_cdc_materialize" -> 0.29,
        "dd_minhash_lsh" -> 0.85, "dd_embed_neardup" -> 1.62,
        "dd_cluster" -> 0.7, "sim_ann_lsh" -> 1.74, "sim_ann_ivf" -> 0.87,
        "tx_token_count" -> 0.09, "cu_dedup_pipeline" -> 0.41,
        "sim_ann_recall" -> 4.38, "sim_cosine_topk" -> 3.29)

  private val line = Bench.compactLine(results, results.map(_._2).sum,
    """["sim_ann_recall","sim_cosine_topk"]""", "/root/testdata/sf0.1",
    "bench_out.json")

  test("compact line fits the harness tail buffer with margin for sbt's epilogue") {
    assert(line.length <= 1700, s"line is ${line.length} chars")
    assert(!line.contains("\n"))
  }

  test("compact line is valid JSON with the summary fields and headline queries") {
    val node = mapper.readTree(line) // throws on malformed JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() > 0)
    assert(node.get("unit").asText() == "sec")
    assert(node.get("stat").asText() == "median")
    assert(node.get("n_queries").asInt() == results.size)
    assert(node.get("full").asText() == "bench_out.json")
    assert(node.get("grading_companions").isArray)
    val qs = node.get("queries")
    // every baseline-relevant headliner survives truncation
    for (h <- Seq("v0_validation_suite", "a2_distinct_pk", "j1_anti_join",
        "s7_cdc_upsert_apply", "dd_embed_neardup", "sim_ann_lsh"))
      assert(qs.has(h), s"headline query $h missing from compact line")
    // after headliners, the fill is most-expensive-first: the costliest
    // non-headline query must be present
    assert(qs.has("sim_ann_recall"))
  }

  test("total_ex_companions excludes companions and failed (-1) passes") {
    val withFail = results :+ ("zz_broken" -> -1.0)
    val l2 = Bench.compactLine(withFail, withFail.map(_._2).sum,
      "[]", "sf", "out.json")
    val node = mapper.readTree(l2)
    val expected = results.collect {
      case (k, v) if !Bench.GradingCompanions.contains(k) => v }.sum
    assert(math.abs(node.get("total_ex_companions").asDouble() - expected) < 1e-3)
  }
}
