package graft

import graft.types.{LsnCodec, PgTypeMapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PgTypesSpec extends SparkSpec {
  import spark.implicits._

  test("LsnCodec scala round-trip matches PG %X/%X rendering") {
    assert(LsnCodec.parse("16/B374D848") == 0x16B374D848L)
    assert(LsnCodec.format(0x16B374D848L) == "16/B374D848")
    assert(LsnCodec.format(0L) == "0/0")
    assert(LsnCodec.parse(LsnCodec.format(Long.MaxValue)) == Long.MaxValue)
  }

  test("LsnCodec column round-trip") {
    val lsns = Seq(0L, 1L, 0x16B374D848L, 0xFFFFFFFFL, 0x7FFFFFFFFFFFFFFFL)
    val df = lsns.toDF("lsn")
      .withColumn("s", LsnCodec.formatCol(col("lsn")))
      .withColumn("back", LsnCodec.parseCol(col("s")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[String]("s") == LsnCodec.format(r.getAs[Long]("lsn")))
      assert(r.getAs[Long]("back") == r.getAs[Long]("lsn"))
    }
  }

  test("PG typname mapping") {
    assert(PgTypeMapper.toSpark("text") == StringType)
    assert(PgTypeMapper.toSpark("numeric(10,2)") == DecimalType(10, 2))
    assert(PgTypeMapper.toSpark("numeric") == DecimalType(38, 18))
    assert(PgTypeMapper.toSpark("numeric(64,30)") == DecimalType(38, 30))
    assert(PgTypeMapper.toSpark("timestamp with time zone") == TimestampType)
    assert(PgTypeMapper.toSpark("bytea") == BinaryType)
    assert(PgTypeMapper.toSpark("integer[]") == ArrayType(IntegerType))
    assert(PgTypeMapper.toSpark("pg_lsn") == LongType)
    // arrays of parameterized/prefixed scalars must stay arrays
    assert(PgTypeMapper.toSpark("numeric(10,2)[]") == ArrayType(DecimalType(10, 2)))
    assert(PgTypeMapper.toSpark("timestamp with time zone[]") == ArrayType(TimestampType))
    // xid is unsigned 32-bit — must be long
    assert(PgTypeMapper.toSpark("xid") == LongType)
  }

  test("castFromText decodes PG array literals into typed Spark arrays") {
    val df = Seq("""{1,2,NULL,42}""").toDF("a")
      .select(PgTypeMapper.castFromText(col("a"), ArrayType(IntegerType)).as("arr"))
    import spark.implicits._
    assert(df.as[Seq[Option[Int]]].collect()(0) ==
      Seq(Some(1), Some(2), None, Some(42)))
  }

  test("LsnCodec.parse rejects malformed input with a named error") {
    intercept[IllegalArgumentException] { LsnCodec.parse("") }
    intercept[IllegalArgumentException] { LsnCodec.parse("nohex/zz") }
  }

  test("bytea hex decode handles PG \\x prefix AND bare hex") {
    val df = Seq("\\x48656c6c6f", "48656c6c6f").toDF("h")
      .select(PgTypeMapper.castFromText(col("h"), BinaryType).as("b"))
    val rows = df.collect().map(r => new String(r.getAs[Array[Byte]]("b")))
    assert(rows.toSeq == Seq("Hello", "Hello"))
  }

  test("timestamptz text with offset casts correctly (F3 grammar)") {
    val df = Seq("2021-03-17 10:04:29.123456+01").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    val ts = df.collect()(0).getAs[java.sql.Timestamp]("ts")
    // 10:04:29.123456+01 == 09:04:29.123456 UTC
    assert(ts.toInstant.toString == "2021-03-17T09:04:29.123456Z")
  }
}
