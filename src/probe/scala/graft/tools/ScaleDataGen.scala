package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver-generated test data: replicates
  * sf0.1 `copies`× with key-shifted ids so FK joins stay intact inside
  * each copy, producing an sf1-equivalent corpus for the scale soak
  * (VERDICT r4 ask #3). The soak's question is "does any blocked/bucketed
  * operator go super-linear?", so the replication is engineered to keep
  * per-copy structure identical while NOT creating cross-copy duplicate
  * or near-duplicate structure (which would quadratically inflate every
  * pair-emitting dedup query and measure data pathology, not operator
  * scaling):
  *
  *  - fact/dim tables: PK and FK columns shifted by `copy * stride`
  *    (stride > any source key), everything else unchanged — aggregates
  *    and joins scale exactly linearly by construction;
  *  - documents: copies ≥ 1 apply a per-copy class-preserving BIJECTIVE
  *    character substitution (a seeded permutation of a–z, A–Z and 0–9,
  *    each class onto itself; whitespace/punctuation untouched). A
  *    bijection on characters induces an injection on char n-grams, so
  *    EVERY within-copy shingle-set Jaccard — same-base or cross-base —
  *    is exactly the copy-0 value, while cross-copy shingle sets
  *    decorrelate (two copies' permutations agree on a given n-gram
  *    only by chance). Doc lengths, whitespace/token structure and
  *    character-class counts are preserved, so every text metric
  *    (token counts, quality ratios, n_chars) is copy-invariant. The
  *    r9 scheme (per-token "~c" suffixes) decorrelated SAME-base
  *    cross-copy pairs but silently injected shared "~c" boilerplate
  *    shingles into every doc of a copy, lifting CROSS-base within-copy
  *    char-8-gram Jaccard from avg 0.044 (copy 0) to avg 0.277 — at 100
  *    copies that is ~1.2 B moderate-similarity pairs and 58 M LSH band
  *    candidates whose exact verification no box can hold, i.e. the
  *    soak was measuring a datagen pathology, not operator scaling
  *    (round-10 probes, SCALE_SOAK.md);
  *  - embeddings: vectors of copy c are circularly rotated by c
  *    dimensions — norms and within-copy cosines are exactly preserved,
  *    cross-copy cosines decorrelate.
  *
  * Writes to `SPARK_GRAFT_OUT_DIR` (default `target/testdata/sf1`), one
  * `<table>.parquet` directory per table, readable by [[graft.sources.Tables]]
  * exactly like the driver's flat files. Never touches /root/testdata.
  */
object ScaleDataGen {
  val Stride = 1000000000L // > every source key; copy c adds c*Stride

  private def shifted(df: DataFrame, copies: Int, keyCols: Seq[String]): DataFrame = {
    val exploded = df.withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
    keyCols.foldLeft(exploded) { (d, k) =>
      d.withColumn(k, (col(k) + col("__c") * Stride).cast(df.schema(k).dataType))
    }.drop("__c")
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "target/testdata/sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dimensions stay as-is: at every SF the reference schema has 5
    // regions / 25 nations, and scaled facts keep referencing them
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(shifted(read("customer"), copies, Seq("c_custkey")), "customer", 4)
    write(shifted(read("supplier"), copies, Seq("s_suppkey")), "supplier", 1)
    write(shifted(read("part"), copies, Seq("p_partkey")), "part", 4)
    write(shifted(read("orders"), copies, Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(shifted(read("lineitem"), copies,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 32)
    // events.ts reads as long (TIMESTAMP_NANOS under nanosAsLong) and is
    // written back as long — Tables.events converts either encoding.
    write(shifted(read("events"), copies, Seq("event_id", "user_id")), "events", 16)

    // per-copy alphabet permutations: one seeded Fisher-Yates shuffle of
    // each character class per copy (copy 0 = identity), applied via
    // translate() so the map is a strict char bijection
    val alphaFrom = ('a' to 'z').mkString + ('A' to 'Z').mkString + ('0' to '9').mkString
    def permuted(copy: Int): String = {
      if (copy == 0) return alphaFrom
      val rnd = new scala.util.Random(0x5ca1eda7aL + copy)
      def shuf(s: Seq[Char]) = rnd.shuffle(s).mkString
      shuf('a' to 'z') + shuf('A' to 'Z') + shuf('0' to '9')
    }
    val perms = spark.createDataFrame(
      (0 until copies).map(c => (c, permuted(c)))).toDF("__c", "__to")
    val docs = read("documents")
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("doc_id", col("doc_id") + col("__c") * Stride)
      .join(broadcast(perms), Seq("__c"))
      .withColumn("text", expr(s"translate(text, '$alphaFrom', __to)"))
      .withColumn("n_chars", length(col("text")))
      .drop("__c", "__to")
    write(docs, "documents", 8)

    val dim = read("embeddings").select(size(col("embedding"))).first().getInt(0)
    // copy transform = rotation (c % dim) composed with an odd-element
    // sign flip when c ≥ dim — both orthogonal, so norms and
    // WITHIN-copy cosines are exactly preserved (both sides of a pair
    // get the same transform) while cross-copy cosines decorrelate;
    // without the sign tier, copy c and copy c−dim would share a
    // rotation and be exact cross-copy duplicates. Output is unchanged
    // for copies ≤ dim (the sign tier never fires).
    require(copies <= 2 * dim,
      s"embedding transform family supports ≤ ${2 * dim} copies (rotation × sign tiers)")
    val rot = col("__c") % dim
    val rotated = when(rot === 0, col("embedding"))
      .otherwise(concat(
        slice(col("embedding"), rot + 1, lit(dim) - rot),
        slice(col("embedding"), lit(1), rot)))
    val emb = read("embeddings")
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("vec_id", col("vec_id") + col("__c") * Stride)
      .withColumn("embedding",
        when(col("__c") < dim, rotated)
          .otherwise(transform(rotated, (x, i) =>
            when(i % 2 === 1, -x).otherwise(x))))
      .drop("__c")
    write(emb, "embeddings", 4)

    graft.sources.Tables.all.foreach { t =>
      println(f"$t%-12s ${spark.read.parquet(s"$out/$t.parquet").count()}%,d rows")
    }
    spark.stop()
  }
}
