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
    // the float vector is exactly the 16-bit-slice view of the graded
    // entropy blocks — the contract that lets the hex column certify
    // the codec path for the non-hashable array
    val hx = Multimodal.extractFeatures(media, nFeatures = 8)
      .select("media_id", "features_hex").as[(Long, String)].collect().toMap
    for ((id, hex) <- hx) {
      assert(hex == java.security.MessageDigest.getInstance("MD5")
        .digest("payload-bytes-%d0".format(id).getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString)
      val expected = (0 until 8).map(j =>
        Integer.parseInt(hex.substring(4 * j, 4 * j + 4), 16) / 65536.0f)
      assert(f1(id).toSeq == expected)
    }
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

  /** Reference (driver-side) block-parity signature — the independent
    * reimplementation [[Multimodal.blockPerceptualHash]] is checked
    * against: bit i = parity of the first md5 nibble of the i-th of 64
    * equal byte blocks.
    */
  private def refPh(payload: Array[Byte]): String = {
    val n = payload.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val bits = (0 until 64).map { i =>
      val a = (i.toLong * n / 64).toInt
      val b = ((i + 1).toLong * n / 64).toInt
      md.reset()
      val d = md.digest(java.util.Arrays.copyOfRange(payload, a, b))
      ((d(0) >> 4) & 0xf) % 2
    }
    (0 until 16).map { c =>
      val v = bits(4 * c) * 8 + bits(4 * c + 1) * 4 + bits(4 * c + 2) * 2 +
        bits(4 * c + 3)
      "0123456789abcdef".charAt(v)
    }.mkString
  }

  private def refHamming(a: String, b: String): Int =
    (0 until 16).map(i => Integer.bitCount(
      Integer.parseInt(a.substring(i, i + 1), 16) ^
        Integer.parseInt(b.substring(i, i + 1), 16))).sum

  private def mediaOf(rows: Seq[(Long, String)]) =
    rows.toDF("media_id", "s")
      .select($"media_id", lit("image").as("kind"),
        $"s".cast("binary").as("payload"),
        struct(lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames"), lit("m").as("mime")).as("meta"))

  test("mm_dedup_near: hexHamming64 arithmetic; identical payloads pair at 0; rollup counts (r19)") {
    // nibble-fold Hamming on crafted signatures
    val hamDf = Seq(
      ("0000000000000000", "0000000000000000"), // 0
      ("0000000000000000", "0000000000000001"), // 1
      ("0000000000000000", "000000000000000f"), // 4
      ("ffffffffffffffff", "0000000000000000")) // 64
      .toDF("a", "b")
      .select(graft.operators.Multimodal.hexHamming64($"a", $"b").as("h"))
      .as[Int].collect().toSeq
    assert(hamDf == Seq(0, 1, 4, 64), s"got $hamDf")
    // signature == the block-parity hash (reference impl above);
    // expected pairs = brute force over the reference signatures
    val texts = Seq((1L, "same bytes"), (2L, "same bytes"),
      (3L, "same bytes"), (4L, "other data"))
    val sigs = texts.map { case (id, t) => id -> refPh(t.getBytes("UTF-8")) }.toMap
    val expected = (for {
      (a, pa) <- sigs; (b, pb) <- sigs if a < b
      h = refHamming(pa, pb) if h <= 3
    } yield (a, b, h)).toSet
    assert(expected.contains((1L, 2L, 0)), s"fixture lost its exact pairs: $expected")
    val media = mediaOf(texts)
    val pairs = graft.operators.Multimodal.dedupNear(media)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == expected, s"got $pairs, want $expected")
    val stats = graft.operators.Multimodal.dedupNearStats(media)
      .orderBy("media_id").as[(Long, String, Long)].collect().toSeq
    val expNear = texts.map { case (id, _) =>
      expected.count(p => p._1 == id || p._2 == id).toLong }
    assert(stats.map(_._3) == expNear, s"got $stats")
    assert(stats.head._2 == sigs(1L),
      s"graded ph ${stats.head._2} != block-parity reference ${sigs(1L)}")
  }

  test("mm_dedup_near: planted block edits land at Hamming 1-3 and the banding finds them (r20)") {
    // 128-byte base -> every signature block is exactly 2 bytes; edits
    // confined to the last 2 blocks move the signature <= 2 bits
    val base = "ab" * 64
    val variants = ('c' to 'z').map(ch => base.dropRight(4) + (ch.toString * 4))
    val baseSig = refPh(base.getBytes("UTF-8"))
    val hams = variants.map(v => refHamming(baseSig, refPh(v.getBytes("UTF-8"))))
    assert(hams.forall(_ <= 2), s"edit in 2 blocks moved > 2 bits: $hams")
    assert(hams.exists(h => h >= 1 && h <= 3),
      s"fixture has no pair in the 1..3 verify band: $hams")
    val texts = (1L -> base) +: variants.zipWithIndex.map {
      case (v, i) => (i + 2L) -> v }
    val sigs = texts.map { case (id, t) => id -> refPh(t.getBytes("UTF-8")) }.toMap
    val expected = (for {
      (a, pa) <- sigs; (b, pb) <- sigs if a < b
      h = refHamming(pa, pb) if h <= 3
    } yield (a, b, h)).toSet
    val got = graft.operators.Multimodal.dedupNear(mediaOf(texts))
      .as[(Long, Long, Int)].collect().toSet
    // banding is LOSSLESS at radius 3 (pigeonhole over 4x16-bit
    // chunks): the banded plan must equal the brute-force pair set,
    // which includes true near pairs at Hamming 1..3, not just 0
    assert(got == expected, s"banded pairs != brute force: got $got, want $expected")
    assert(got.exists(p => p._3 >= 1 && p._3 <= 3),
      s"no pair exercised the 1..3 Hamming verify path: $got")
  }

  test("tx_bpe_merges: greedy non-overlapping fold; later merges consume earlier symbols (r20)") {
    import graft.operators.BpeTrainer
    // the flagless left-to-right fold's edge cases (runs of matches,
    // odd-rank survival, no-op words)
    val folds = Seq(
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("b", "a", "a", "a"), "a", "a", Seq("b", "aa", "a")),
      (Seq("a", "b", "a", "b"), "a", "b", Seq("ab", "ab")),
      (Seq("a", "a", "b"), "a", "b", Seq("a", "ab")),
      (Seq("x"), "a", "b", Seq("x")))
    folds.foreach { case (in, l, r, want) =>
      val got = Seq(Tuple1(in)).toDF("syms")
        .select(BpeTrainer.mergeCol($"syms", l, r)).as[Seq[String]].head()
      assert(got == want, s"merge($l,$r) on $in: got $got want $want")
    }
    // Sennrich 2016's worked vocabulary: low:5 lower:2 newest:6 widest:3
    val docs = Seq(("low " * 5) + ("lower " * 2) + ("newest " * 6) +
      ("widest " * 3)).toDF("text").withColumn("doc_id", lit(1L))
    val rules = BpeTrainer.train(docs, "text", 4)
    val got = rules.map(m => (m.left, m.right, m.n))
    // iter1: es/st tie at 9 -> (e,s) by the l-asc tie-break; iter2's
    // LEFT is iter1's merged symbol (the iterated semantics); iter3:
    // lo/ow tie at 7 -> (l,o); iter4 merges (lo,w)
    assert(got == Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L),
      ("lo", "w", 7L)), s"got $got")
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

class CurationSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  /** Write a controlled documents table and run a graded Q against it. */
  private def withDocs(rows: Seq[(Long, String)])(f: String => Unit): Unit = {
    val dir = tmpDir("curation")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("cu_pack: budget boundaries split exactly, offsets stay inside the pack") {
    val budget = QueriesExt.PackBudget // 2048
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    withDocs(Seq(1L -> doc(1000), 2L -> doc(1500), 3L -> doc(600),
      4L -> doc(2048), 5L -> doc(1))) { dir =>
      val got = QueriesExt.cuPack(spark, dir)
        .select("doc_id", "n_tokens", "pack_id", "pack_offset")
        .as[(Long, Long, Long, Long)].collect().toList
      // start tokens: 0, 1000, 2500, 3100, 5148
      assert(got == List((1L, 1000L, 0L, 0L), (2L, 1500L, 0L, 1000L),
        (3L, 600L, 1L, 2500L % budget), (4L, 2048L, 1L, 3100L % budget),
        (5L, 1L, 2L, 5148L % budget)))
      got.foreach { case (_, _, _, off) => assert(off >= 0 && off < budget) }
    }
  }

  test("cu_pack_ffd: first-fit-decreasing placement, truncation, shard and lang isolation") {
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // budget 10, one shard: sizes 7,6,4,3 -> FFD: 7->bin1@0, 6->bin2@0,
    // 4->bin2@6 (first fit skips bin1: 10-7=3 < 4), 3->bin1@7; both full
    val d1 = Seq((0L, doc(7)), (1L, doc(6)), (2L, doc(4)), (3L, doc(3)))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got1 = QueriesExt.ffdPack(d1, budget = 10L, shardSize = 100L,
        graft.functions.TextAnalysis.tokenCount)
      .select("doc_id", "seq_id", "seq_offset", "pad_fraction")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    assert(got1 == List((0L, 1L, 0L, 0.0), (1L, 2L, 0L, 0.0),
      (2L, 2L, 6L, 0.0), (3L, 1L, 7L, 0.0)), s"got $got1")
    // oversized doc truncates to the budget and fills its own sequence
    val d2 = Seq((0L, doc(25)), (1L, doc(4))).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val got2 = QueriesExt.ffdPack(d2, budget = 10L, shardSize = 100L,
        graft.functions.TextAnalysis.tokenCount)
      .select("doc_id", "seq_id", "seq_offset", "pad_fraction")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    assert(got2 == List((0L, 1L, 0L, 0.0), (1L, 2L, 0L, 0.6)), s"got $got2")
    // shard boundary: ids 0,1 vs 2,3 pack independently (seq ids restart),
    // and languages never share a sequence
    val d3 = Seq((0L, doc(6), "en"), (1L, doc(4), "en"),
      (2L, doc(6), "en"), (3L, doc(4), "fr")).toDF("doc_id", "text", "lang")
    val got3 = QueriesExt.ffdPack(d3, budget = 10L, shardSize = 2L,
        graft.functions.TextAnalysis.tokenCount)
      .select("doc_id", "shard", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got3 == List((0L, 0L, 1L, 0L), (1L, 0L, 1L, 6L),
      (2L, 1L, 1L, 0L), (3L, 1L, 1L, 0L)), s"got $got3")
  }

  test("cu_epoch_budget: cap binds, plain repeat, no-repeat, and zero-token source") {
    val df = Seq(
      (0L, (1 to 80).map(i => s"a$i").mkString(" "), "A"),
      (1L, (1 to 10).map(i => s"b$i").mkString(" "), "B"),
      (2L, "", "C")).toDF("doc_id", "text", "lang")
    val got = QueriesExt.epochBudget(df, "lang",
        graft.functions.TextAnalysis.tokenCount)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Double, Long)]
      .collect().toList
    // T=90, k=3, multiplier 3 -> target 90 each
    assert(got == List(
      // A: U=80, needed 2, served min(90,160)=90, eff 80 + 10/2
      ("A", 80L, 90L, 2L, 2L, 80L, 90L, 10L, 10.0 / 90.0, 85L),
      // B: U=10, needed 9 -> CAPPED at 4; served 40 < target (shortfall)
      ("B", 10L, 90L, 9L, 4L, 10L, 40L, 30L, 0.75, 18L),
      // C: zero tokens -> all zero, share 0 (no NaN/div-zero)
      ("C", 0L, 90L, 0L, 0L, 0L, 0L, 0L, 0.0, 0L)), s"got $got")
    // no-repeat regime: multiplier 1 with an abundant source
    val df2 = Seq(
      (0L, (1 to 80).map(i => s"a$i").mkString(" "), "A"),
      (1L, (1 to 200).map(i => s"d$i").mkString(" "), "D")).toDF("doc_id", "text", "lang")
    val got2 = QueriesExt.epochBudget(df2, "lang",
        graft.functions.TextAnalysis.tokenCount, multiplier = 1L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Double, Long)]
      .collect().toList
    // T=280, target 140: D needs no repetition at all
    assert(got2(1) == (("D", 200L, 140L, 1L, 1L, 140L, 140L, 0L, 0.0, 140L)),
      s"got ${got2(1)}")
  }

  test("cu_epoch_mix: temperature shares sum to 1 and shift epochs vs the uniform split") {
    val mix = QueriesExt.cuEpochMix(spark, sf001).collect()
    val shares = mix.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-12, s"shares sum ${shares.sum}")
    // temperature FLATTENS: the largest language's share is below its
    // raw token proportion, small languages above — so targets (and
    // therefore epochs) shift vs cu_epoch_budget's uniform split
    val uni = QueriesExt.cuEpochBudget(spark, sf001).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("epochs")).toMap
    val mx = mix.map(r => r.getAs[String]("lang") -> r.getAs[Long]("epochs")).toMap
    assert(uni.keySet == mx.keySet)
    assert(uni != mx, s"mixture must shift at least one language's epochs: $mx")
    mix.foreach { r =>
      assert(r.getAs[Long]("epochs") <= QueriesExt.EpochMaxRepeats)
      assert(r.getAs[Double]("served_tokens") <=
        r.getAs[Double]("target_tokens") + 1e-9)
    }
  }

  test("tx_bpe_pairs: within-token char pairs, deterministic tie-break, single-char tokens skipped") {
    withDocs(Seq(1L -> "abab x", 2L -> "cc cc")) { dir =>
      // "abab" -> ab, ba, ab; "x" skipped (<2 chars); "cc" x2 -> cc x2
      val got = QueriesExt.txBpePairs(spark, dir)
        .as[(Long, String, Long)].collect().toList
      assert(got == List((1L, "ab", 2L), (2L, "cc", 2L), (3L, "ba", 1L)),
        s"got $got")
    }
    // cross-token pairs must NOT count: "ab" + "cd" has no "bc"
    withDocs(Seq(1L -> "ab cd")) { dir =>
      val pairs = QueriesExt.txBpePairs(spark, dir)
        .select("pair").as[String].collect().toSet
      assert(pairs == Set("ab", "cd"), s"got $pairs")
    }
  }

  test("cu_decontaminate_bloom: no false negatives vs the exact op; flags propagate") {
    // same eval-mod convention, sf0.001: the bloom verdicts must be a
    // SUPERSET of the exact gram-string verdicts (FPs allowed by
    // contract, FNs never)
    val exact = SparkEntry.queries("cu_decontaminate")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bloom = SparkEntry.queries("cu_decontaminate_bloom")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(bloom.keySet == exact.keySet, "row sets must agree")
    val falseNeg = exact.filter { case (id, c) => c && !bloom(id) }
    assert(falseNeg.isEmpty, s"bloom missed contaminated docs: ${falseNeg.keys}")
    // at this scale the 2^20-bit filter is ~0.3% full: verdicts agree
    assert(bloom == exact, {
      val fps = bloom.filter { case (id, c) => c && !exact(id) }
      s"unexpected FPs at tiny fill: ${fps.keys}"
    })
  }

  test("decontamBloomWords: distributed bit_or build == per-hash driver build (r19)") {
    // the distributed build (explode positions -> bit_or per word,
    // <=16,384 rows to the driver) must produce the IDENTICAL bitmap
    // as setting each gram hash's 3 slice bits one by one
    import org.apache.spark.sql.functions.{col, explode}
    val grams = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        explode(graft.plans.GraftFunctions.tokenGramHashes(col("text"), 8)).as("h"))
      .filter(col("doc_id") % 20 === 0)
    val distributed = QueriesExt.decontamBloomWords(grams)
    val mask = (QueriesExt.DecontamBloomBits - 1).toLong
    val reference = new Array[Long](QueriesExt.DecontamBloomBits / 64)
    grams.select("h").distinct().collect().map(_.getLong(0)).foreach { h =>
      (0 until QueriesExt.DecontamBloomSlices).foreach { j =>
        val p = ((h >>> (20 * j)) & mask).toInt
        reference(p >> 6) |= (1L << (p & 63))
      }
    }
    assert(distributed.length == reference.length)
    val diff = distributed.indices.filter(i => distributed(i) != reference(i))
    assert(diff.isEmpty, s"bitmap words differ at indexes ${diff.take(5)}")
    assert(distributed.count(_ != 0L) > 0, "fixture produced an empty filter")
  }

  test("cu_chunk: stride windows with overlap, exact boundaries, short docs") {
    val toks50 = (1 to 50).map(i => s"t$i")
    withDocs(Seq(1L -> toks50.mkString(" "), 2L -> "a b")) { dir =>
      val out = QueriesExt.cuChunk(spark, dir)
        .select($"doc_id", $"chunk_id", $"chunk_text", $"chunk_tokens")
        .as[(Long, Long, String, Long)].collect()
      val d1 = out.filter(_._1 == 1L).sortBy(_._2)
      // 50 tokens, size 32 / stride 24 -> starts 0,24,48
      assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
      assert(d1(0)._3 == toks50.take(32).mkString(" ") && d1(0)._4 == 32L)
      assert(d1(1)._3 == toks50.slice(24, 50).mkString(" ") && d1(1)._4 == 26L)
      assert(d1(2)._3 == toks50.slice(48, 50).mkString(" ") && d1(2)._4 == 2L)
      // consecutive full chunks overlap by size - stride tokens
      assert(d1(0)._3.split(' ').drop(QueriesExt.ChunkStride).toSeq ==
        d1(1)._3.split(' ').take(QueriesExt.ChunkSize - QueriesExt.ChunkStride).toSeq)
      val d2 = out.filter(_._1 == 2L)
      assert(d2.toSeq == Seq((2L, 0L, "a b", 2L))) // sub-size doc: one chunk
    }
  }

  test("tx_repetition: degenerate, uniform, and sub-bigram docs") {
    withDocs(Seq(
      1L -> "a a a a",      // fully repeated
      2L -> "a b c d",      // fully distinct
      3L -> "x"             // no bigrams
    )) { dir =>
      val out = QueriesExt.txRepetition(spark, dir)
        .as[(Long, Option[Double], Option[Double], Option[Double])]
        .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(out(1L) == ((Some(0.25), Some(1.0), Some(1.0))))
      assert(out(2L) == ((Some(1.0), Some(0.25), Some(1.0 / 3.0))))
      assert(out(3L) == ((Some(1.0), Some(1.0), None))) // single token: NULL bigram share
    }
  }

  test("cu_token_mix: per-stratum totals and shares summing to 1") {
    val dir = tmpDir("mix")
    Seq((1L, "a b c", "en", "web"), (2L, "d e", "en", "web"),
      (3L, "f g h i j", "de", "book"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = QueriesExt.cuTokenMix(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(out == Set(("de", "book", 1L, 5L, 0.5), ("en", "web", 2L, 5L, 0.5)))
  }

  test("cu_decontaminate: any shared 8-gram flags the doc; 7-gram overlap does not") {
    val evalToks = (1 to 10).map(i => s"w$i")
    withDocs(Seq(
      20L -> evalToks.mkString(" "),                    // eval doc (id % 20 == 0)
      1L -> ("x " + evalToks.take(8).mkString(" ")),    // shares w1..w8 -> contaminated
      2L -> (1 to 9).map(i => s"z$i").mkString(" "),    // disjoint vocabulary
      3L -> ("y " + evalToks.take(7).mkString(" "))     // only a 7-gram overlap
    )) { dir =>
      val out = QueriesExt.cuDecontaminate(spark, dir)
        .as[(Long, Boolean)].collect().toMap
      assert(out == Map(1L -> true, 2L -> false, 3L -> false)) // eval doc excluded
    }
  }
}
