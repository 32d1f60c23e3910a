package graft

import graft.functions.Conversions
import graft.catalog.TypeMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ConversionsSpec extends SparkSuite {
  import spark.implicits._

  test("F1 bit(1) bytes -> boolean") {
    val df = Seq(Array[Byte](0), Array[Byte](1), Array[Byte](0, 1)).toDF("b")
    val got = df.select(Conversions.bitBytesToBool($"b")).as[Boolean].collect()
    assert(got.toSeq == Seq(false, true, true))
  }

  test("F2 tinyint -> boolean with null passthrough") {
    val df = Seq[Option[Int]](Some(0), Some(1), Some(5), None).toDF("t")
    val got = df.select(Conversions.tinyintToBool($"t")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq == Seq(false, true, true, null))
  }

  test("F3 zero-date -> null") {
    val df = Seq("0000-00-00", "0000-00-00 00:00:00", "2024-01-02").toDF("d")
    val got = df.select(Conversions.zeroDateToNull($"d")).collect().map(_.get(0))
    assert(got.toSeq == Seq(null, null, "2024-01-02"))
  }

  test("F4 NUL stripping is idempotent") {
    val df = Seq("a\u0000b\u0000", "plain").toDF("s")
    val once = df.select(Conversions.stripNul($"s").as("s"))
    val twice = once.select(Conversions.stripNul($"s").as("s"))
    assert(once.as[String].collect().toSeq == Seq("ab", "plain"))
    assert(twice.as[String].collect().toSeq == Seq("ab", "plain"))
  }

  test("F5/F6/F7 COPY encoders") {
    val df = Seq(("ab", true, "x\ty\\z\nw")).toDF("b", "f", "e")
    val got = df.select(
      Conversions.bytesToPgHex($"b".cast("binary")),
      Conversions.boolToPgText($"f"),
      Conversions.copyEscape($"e")).head()
    assert(got.getString(0) == "\\x6162")
    assert(got.getString(1) == "t")
    assert(got.getString(2) == "x\\ty\\\\z\\nw")
  }

  test("F8 TypeMapper MySQL type strings") {
    assert(TypeMapper.toSparkType("tinyint(1)") == BooleanType)
    assert(TypeMapper.toSparkType("bit(1)") == BooleanType)
    assert(TypeMapper.toSparkType("tinyint") == ShortType)
    assert(TypeMapper.toSparkType("int unsigned") == LongType)
    assert(TypeMapper.toSparkType("decimal(10,2)") == DecimalType(10, 2))
    assert(TypeMapper.toSparkType("varchar(255)") == StringType)
    assert(TypeMapper.toSparkType("datetime") == TimestampNTZType)
    assert(TypeMapper.toSparkType("timestamp") == TimestampType)
    assert(TypeMapper.toSparkType("mediumblob") == BinaryType)
    assert(TypeMapper.toSparkType("gibberish_type") == StringType)
  }

  test("F10 timestamp column detection order") {
    import graft.catalog.TableMeta
    val s = StructType(Seq(StructField("id", LongType),
      StructField("created_at", TimestampType), StructField("updated_at", TimestampType)))
    assert(TableMeta.detectTsCol(s).contains("updated_at"))
  }
}
