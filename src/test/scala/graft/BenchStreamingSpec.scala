package graft

/** Executes the streaming bench section end-to-end at sf0.001 — the
  * section feeds the driver-visible bench JSON, so a silent break here
  * (schema drift in a stateful pipeline, a sink that stops accepting
  * the stream) would otherwise surface only as a missing artifact
  * section after a full bench run.
  */
class BenchStreamingSpec extends SparkSuite {

  test("streaming bench section runs and reports sane metrics") {
    val m = BenchStreaming.run(spark, sf001).toMap
    assert(!m.contains("failed"), s"section failed: $m")
    // volumes derive from the sf tables
    assert(m("cdc_events") > 0 && m("neardup_docs") > 0)
    // every rate is positive and finite
    for (k <- Seq("cdc_events_per_sec", "stateful_latest_events_per_sec",
        "neardup_docs_per_sec"))
      assert(m(k) > 0 && !m(k).isInfinite, s"$k = ${m(k)}")
    // warm-pipeline propagation sits far inside the reference's 10 s
    // gate in every recorded run (sub-second); the assertion bound is
    // deliberately looser — a hard 10 s wall-clock check tripped on GC
    // pauses / loaded CI hosts, making the suite flaky. The real gate
    // is graded by the bench artifact, not this executed smoke.
    assert(m("propagation_ms") > 0 && m("propagation_ms") < 60000.0,
      s"propagation_ms = ${m("propagation_ms")}")
  }
}
