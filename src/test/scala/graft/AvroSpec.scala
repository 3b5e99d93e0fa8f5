package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Avro, Tables}

/** §2.9 — Avro container-file source/sink (flink-avro analog) built on the
  * avro core/mapred jars that ship with Spark. */
class AvroSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("roundtrip preserves every supported type including nulls") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t1"
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val df = Seq(
      (1L, true, 7, 1.5f, 2.25, "alpha", Array[Byte](1, 2, 3), ts),
      (2L, false, -1, -0.5f, 1e10, "βeta", Array[Byte](), ts)
    ).toDF("id", "flag", "n", "f", "d", "s", "b", "ts")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getFloat(3), r.getDouble(4),
        r.getString(5), r.getAs[Array[Byte]](6).toSeq, r.getTimestamp(7))
    assert(back.collect().map(canon).toSet == df.collect().map(canon).toSet)
  }

  test("roundtrip null values through the nullable union") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t2"
    val df = Seq[(java.lang.Long, String)]((1L, null), (null, "x"))
      .toDF("a", "s")
    Avro.write(df, dir)
    val got = Avro.read(spark, dir).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(got == Set((1L, null), (null, "x")), got.toString)
  }

  test("NESTED shapes roundtrip: record-in-record, arrays, string maps " +
       "(flink-avro AvroRowDeserializationSchema nested handling)") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/nested"
    val df = Seq(
      (1L, ("alice", 30), Seq(1.5, 2.5), Map("a" -> 1L, "b" -> 2L)),
      (2L, ("bob", 25), Seq.empty[Double], Map.empty[String, Long])
    ).toDF("id", "who", "scores", "tags")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    import org.apache.spark.sql.types._
    assert(back.schema("who").dataType.asInstanceOf[StructType]
      .map(f => (f.name, f.dataType)) == Seq(("_1", StringType), ("_2", IntegerType)))
    assert(back.schema("scores").dataType.asInstanceOf[ArrayType]
      .elementType == DoubleType)
    assert(back.schema("tags").dataType.asInstanceOf[MapType]
      .valueType == LongType)
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), (r.getStruct(1).getString(0), r.getStruct(1).getInt(1)),
        r.getSeq[Double](2), r.getMap[String, Long](3).toMap)
    assert(back.collect().map(canon).toSet == df.collect().map(canon).toSet)
    // deep nesting: array of records, with a null element record field
    val dir2 = Files.createTempDirectory("graft_avro").toString + "/nested2"
    val df2 = Seq(
      (10L, Seq(("x", 1L), (null, 2L))),
      (11L, Seq.empty[(String, Long)])
    ).toDF("id", "items")
    Avro.write(df2, dir2)
    val got = Avro.read(spark, dir2).collect().map { r =>
      (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (if (x.isNullAt(0)) null else x.getString(0), x.getLong(1))))
    }.toSet
    assert(got == Set((10L, Seq(("x", 1L), (null, 2L))), (11L, Seq())), got.toString)
    // the binary record serde gets the same surface for free
    val schemaJson = Avro.toAvroSchema(
      df.schema.asInstanceOf[org.apache.spark.sql.types.StructType], "rec").toString
    val back2 = Avro.decodeRecords(Avro.encodeRecords(df), schemaJson)
    assert(back2.collect().map(canon).toSet == df.collect().map(canon).toSet)
  }

  test("record serde roundtrips rows through schemaless avro binary") {
    val ts = Timestamp.valueOf("2024-03-01 00:00:10.5")
    val df = Seq((1L, "a", 2.5, ts), (2L, null, -1.0, ts)).toDF("id", "s", "v", "ts")
    val schemaJson = Avro.toAvroSchema(
      df.schema.asInstanceOf[org.apache.spark.sql.types.StructType], "rec").toString
    val enc = Avro.encodeRecords(df)
    assert(enc.schema.map(_.name) == Seq("value"))
    val back = Avro.decodeRecords(enc, schemaJson)
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getDouble(2), r.getTimestamp(3))
    assert(back.collect().map(canon).toSet == df.collect().map(canon).toSet)
  }

  test("record serde works unchanged on a STREAMING frame (Kafka wire path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batch = Seq((7L, "x", 1.0), (8L, "y", 2.0)).toDF("id", "s", "v")
    val schemaJson = Avro.toAvroSchema(
      batch.schema.asInstanceOf[org.apache.spark.sql.types.StructType], "rec").toString
    val in = MemoryStream[(Long, String, Double)]
    in.addData((7L, "x", 1.0), (8L, "y", 2.0))
    val stream = in.toDF().toDF("id", "s", "v")
    val decoded = Avro.decodeRecords(Avro.encodeRecords(stream), schemaJson)
    val q = decoded.writeStream.format("memory").queryName("avro_serde")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("avro_serde").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((7L, "x", 1.0), (8L, "y", 2.0)), got.toString)
  }

  test("real table roundtrip: nation survives write+read bit-for-bit") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t3"
    val nation = Tables.load(spark, sfDir, "nation")
    Avro.write(nation, dir)
    val back = Avro.read(spark, dir)
    assert(back.count() == nation.count())
    val a = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("far-date timestamps roundtrip (no nanosecond-range overflow)") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t4"
    // past ~2262 the old micros*1000 nanos path wrapped Long and corrupted
    // the value on READ while the write stayed fine
    val far = Timestamp.valueOf("2500-06-15 08:30:00.5")
    val old = Timestamp.valueOf("1600-01-02 03:04:05.0")
    val df = Seq((1L, far), (2L, old)).toDF("id", "ts")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(back == Set((1L, far), (2L, old)), back.toString)
  }

  test("a mixed-schema directory is rejected loudly, not silently mis-decoded") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t5"
    Avro.write(Seq((1L, "a")).toDF("id", "s"), dir)
    // second write with a DIFFERENT schema into the same directory: give
    // the files distinct names by writing to a subdir and moving the file up
    val tmp2 = Files.createTempDirectory("graft_avro").toString + "/t5b"
    Avro.write(Seq((2.5, 7L)).toDF("x", "y"), tmp2)
    val src = new java.io.File(tmp2).listFiles().filter(_.getName.endsWith(".avro")).head
    val dst = new java.io.File(dir, "zz-" + src.getName)
    java.nio.file.Files.move(src.toPath, dst.toPath)
    val e = intercept[org.apache.spark.SparkException](
      Avro.read(spark, dir).collect())
    assert(e.getMessage.contains("schema mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("schema mismatch")), e.toString)
  }

  test("ENUM decodes to its symbol name and FIXED to raw bytes " +
       "(reference AvroRowDeserializationSchema.java:224,259)") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.GenericData
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("ef").namespace("t").fields()
      .requiredLong("id")
      .name("color").`type`().enumeration("Color")
        .symbols("RED", "GREEN", "BLUE").noDefault()
      .name("digest").`type`().fixed("Digest").size(4).noDefault()
      .name("maybe_color").`type`().unionOf().nullType().and()
        .`type`("Color").endUnion().nullDefault()
      .endRecord()
    val dir = Files.createTempDirectory("graft_avro_ef").toFile
    val f = new java.io.File(dir, "ef.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    val colorSchema = schema.getField("color").schema()
    val fixedSchema = schema.getField("digest").schema()
    def rec(id: Long, color: String, bytes: Array[Byte], maybe: Option[String]) = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("color", new GenericData.EnumSymbol(colorSchema, color))
      r.put("digest", new GenericData.Fixed(fixedSchema, bytes))
      r.put("maybe_color", maybe.map(new GenericData.EnumSymbol(colorSchema, _)).orNull)
      r
    }
    w.append(rec(1L, "RED", Array[Byte](1, 2, 3, 4), Some("BLUE")))
    w.append(rec(2L, "GREEN", Array[Byte](9, 8, 7, 6), None))
    w.close()
    val df = Avro.read(spark, dir.getAbsolutePath)
    val st = df.schema
    assert(st("color").dataType == org.apache.spark.sql.types.StringType)
    assert(st("digest").dataType == org.apache.spark.sql.types.BinaryType)
    assert(st("maybe_color").dataType == org.apache.spark.sql.types.StringType &&
      st("maybe_color").nullable)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("RED", "GREEN"))
    assert(rows.map(_.getAs[Array[Byte]](2).toSeq).toSeq ==
      Seq(Seq[Byte](1, 2, 3, 4), Seq[Byte](9, 8, 7, 6)))
    assert(rows.map(r => Option(r.getString(3))).toSeq == Seq(Some("BLUE"), None))
    // SQL over the decoded frame — the whole point of the widening
    df.createOrReplaceTempView("avro_ef")
    val n = spark.sql(
      "SELECT count(*) FROM avro_ef WHERE color = 'RED' AND hex(digest) = '01020304'")
      .head().getLong(0)
    assert(n == 1L)

    // WRITE-side round trip with the user-supplied schema (the reference
    // AvroOutputFormat contract): string -> enum, binary -> fixed
    val outDir = Files.createTempDirectory("graft_avro_ef_w").toString + "/out"
    Avro.writeAs(df, outDir, schema.toString)
    val back = Avro.read(spark, outDir)
    assert(back.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq,
          Option(r.getString(3)))).toSeq ==
      Seq((1L, "RED", Seq[Byte](1, 2, 3, 4), Some("BLUE")),
          (2L, "GREEN", Seq[Byte](9, 8, 7, 6), None)))
    // and the header carries the ENUM/FIXED types, not widened strings
    val headerStream = new org.apache.avro.file.DataFileStream[GenericRecord](
      new java.io.FileInputStream(new java.io.File(outDir).listFiles()
        .filter(_.getName.endsWith(".avro")).head),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val written = try headerStream.getSchema finally headerStream.close()
    assert(written.getField("color").schema().getType == Schema.Type.ENUM)
    assert(written.getField("digest").schema().getType == Schema.Type.FIXED)
    // a value outside the symbol set is a NAMED error, not corrupt output
    import spark.implicits._
    val badDf = Seq((3L, "PURPLE")).toDF("id", "color")
    val badSchema = SchemaBuilder.record("ef2").namespace("t").fields()
      .requiredLong("id")
      .name("color").`type`().enumeration("Color2")
        .symbols("RED", "GREEN").noDefault()
      .endRecord()
    val eBad = intercept[org.apache.spark.SparkException](
      Avro.writeAs(badDf, outDir + "_bad", badSchema.toString))
    assert(eBad.getMessage.contains("not a symbol") ||
      Option(eBad.getCause).exists(_.getMessage.contains("not a symbol")), eBad.toString)
    // and a frame whose types don't match the schema's decoded shape fails fast
    val eShape = intercept[IllegalArgumentException](
      Avro.writeAs(Seq((1L, 2.0)).toDF("id", "color"), outDir + "_shape",
        badSchema.toString))
    assert(eShape.getMessage.contains("schema mismatch"), eShape.getMessage)
  }

  test("LOGICAL types decode as the reference converts them: date, " +
       "timestamp-millis, decimal on bytes AND fixed " +
       "(AvroSchemaConverter.java:118-148, convertToDecimal/convertToDate)") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    val dateS = LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    val tsmS = LogicalTypes.timestampMillis().addToSchema(Schema.create(Schema.Type.LONG))
    val decB = LogicalTypes.decimal(10, 2).addToSchema(Schema.create(Schema.Type.BYTES))
    val decF = LogicalTypes.decimal(12, 3)
      .addToSchema(Schema.createFixed("Amount", null, "t", 6))
    val schema: Schema = SchemaBuilder.record("lt").namespace("t").fields()
      .requiredLong("id")
      .name("d").`type`(dateS).noDefault()
      .name("maybe_d").`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), dateS)).withDefault(null)
      .name("tsm").`type`(tsmS).noDefault()
      .name("price").`type`(decB).noDefault()
      .name("amount").`type`(decF).noDefault()
      .endRecord()
    def fixedBytes(bd: java.math.BigDecimal, size: Int): Array[Byte] = {
      val raw = bd.unscaledValue().toByteArray
      val out = Array.fill[Byte](size)(if (bd.signum() < 0) -1 else 0)
      System.arraycopy(raw, 0, out, size - raw.length, raw.length)
      out
    }
    val dir = Files.createTempDirectory("graft_avro_lt").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "lt.avro"))
    def rec(id: Long, days: Int, maybe: Option[Int], millis: Long,
            price: java.math.BigDecimal, amount: java.math.BigDecimal) = {
      val r = new GenericData.Record(schema)
      r.put("id", id); r.put("d", days)
      r.put("maybe_d", maybe.map(Int.box).orNull)
      r.put("tsm", millis)
      r.put("price", java.nio.ByteBuffer.wrap(price.unscaledValue().toByteArray))
      r.put("amount", new GenericData.Fixed(decF, fixedBytes(amount, 6)))
      r
    }
    // 2024-03-01 = epoch day 19783; millis chosen on an exact millisecond
    w.append(rec(1L, 19783, Some(0), 1709294096123L,
      new java.math.BigDecimal("12345678.90"), new java.math.BigDecimal("-1.500")))
    w.append(rec(2L, -1, None, 0L,
      new java.math.BigDecimal("-0.01"), new java.math.BigDecimal("123456789.375")))
    w.close()
    val df = Avro.read(spark, dir.getAbsolutePath)
    val st = df.schema
    assert(st("d").dataType == DateType)
    assert(st("maybe_d").dataType == DateType && st("maybe_d").nullable)
    assert(st("tsm").dataType == TimestampType)
    assert(st("price").dataType == DecimalType(10, 2))
    assert(st("amount").dataType == DecimalType(12, 3))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getDate(1).toString).toSeq == Seq("2024-03-01", "1969-12-31"))
    assert(rows(0).getDate(2).toString == "1970-01-01" && rows(1).isNullAt(2))
    assert(rows.map(_.getTimestamp(3).getTime).toSeq == Seq(1709294096123L, 0L))
    assert(rows.map(r => r.getDecimal(4).toPlainString).toSeq ==
      Seq("12345678.90", "-0.01"))
    assert(rows.map(r => r.getDecimal(5).toPlainString).toSeq ==
      Seq("-1.500", "123456789.375"))
    // SQL over the decoded frame: exact decimal arithmetic, date functions
    df.createOrReplaceTempView("avro_lt")
    assert(spark.sql("SELECT CAST(sum(price) AS STRING) FROM avro_lt")
      .head().getString(0) == "12345678.89")
    assert(spark.sql(
      "SELECT count(*) FROM avro_lt WHERE year(d) = 2024").head().getLong(0) == 1L)
  }

  test("DateType and DecimalType columns roundtrip through the generated " +
       "write schema (date-logical int / decimal-logical bytes)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_avro").toString + "/lt_rt"
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType), StructField("v", DecimalType(14, 4))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, java.sql.Date.valueOf("2024-02-29"),
        new java.math.BigDecimal("9999999999.0001")),
      org.apache.spark.sql.Row(2L, java.sql.Date.valueOf("1964-07-02"),
        new java.math.BigDecimal("-0.1000")),
      org.apache.spark.sql.Row(3L, null, null))
    val df = spark.createDataFrame(rows, st)
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema("d").dataType == DateType &&
      back.schema("v").dataType == DecimalType(14, 4))
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.getDate(1)).map(_.toString),
        Option(r.getDecimal(2)).map(_.toPlainString))
    assert(back.collect().map(canon).toSet == df.collect().map(canon).toSet)
    // the written header carries the logical types, not plain int/bytes
    val headerStream = new org.apache.avro.file.DataFileStream[
        org.apache.avro.generic.GenericRecord](
      new java.io.FileInputStream(new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".avro")).head),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val written = try headerStream.getSchema finally headerStream.close()
    def logical(f: String) = written.getField(f).schema().getTypes.get(1).getLogicalType
    assert(logical("d").isInstanceOf[org.apache.avro.LogicalTypes.Date])
    assert(logical("v").isInstanceOf[org.apache.avro.LogicalTypes.Decimal])
  }

  test("writeAs into a timestamp-millis field writes MILLIS (unit from the target schema)") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import spark.implicits._
    // both units decode to TimestampType, so writeAs validation accepts a
    // Timestamp column for either — the encoder must pick the unit from
    // the target field or a millis field gets micros (1000x corruption)
    val tsm = LogicalTypes.timestampMillis().addToSchema(Schema.create(Schema.Type.LONG))
    val s = SchemaBuilder.record("tsm").namespace("t").fields()
      .requiredLong("id").name("at").`type`(tsm).noDefault().endRecord()
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789")
    val df = Seq((1L, t0)).toDF("id", "at")
    val dir = Files.createTempDirectory("graft_avro").toString + "/tsm"
    Avro.writeAs(df, dir, s.toString)
    // raw decode: the long on disk must be epoch MILLIS
    val stream = new org.apache.avro.file.DataFileStream[
        org.apache.avro.generic.GenericRecord](
      new java.io.FileInputStream(new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".avro")).head),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val raw = try stream.next().get("at").asInstanceOf[Long] finally stream.close()
    assert(raw === t0.getTime, s"expected epoch millis ${t0.getTime}, got $raw")
    // and the engine's own read round-trips it
    val back = Avro.read(spark, dir).select("at").as[java.sql.Timestamp].head()
    assert(back === t0)
  }

  test("time-millis and decimal-into-FIXED writes are NAMED rejections") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    val timeS = LogicalTypes.timeMillis().addToSchema(Schema.create(Schema.Type.INT))
    val s = SchemaBuilder.record("tm").namespace("t").fields()
      .name("t").`type`(timeS).noDefault().endRecord()
    val e = intercept[RuntimeException](Avro.toStructType(s))
    assert(e.getMessage.contains("time-millis"), e.getMessage)
    // decimal targeting a fixed field: read works (prior test), write is named
    val decF = LogicalTypes.decimal(12, 3)
      .addToSchema(Schema.createFixed("Amt2", null, "t", 6))
    val fs = SchemaBuilder.record("fx").namespace("t").fields()
      .requiredLong("id").name("amount").`type`(decF).noDefault().endRecord()
    import spark.implicits._
    val df = Seq((1L, BigDecimal("1.500"))).toDF("id", "amount")
      .select($"id", $"amount".cast(org.apache.spark.sql.types.DecimalType(12, 3))
        .as("amount"))
    val eW = intercept[Exception](Avro.writeAs(df,
      Files.createTempDirectory("graft_avro").toString + "/fx", fs.toString))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(eW).exists(_.contains("FIXED field is not supported")), eW.toString)
  }
}
