package graft.sources

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.{AvroJob, AvroOutputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapred.JobConf
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source/sink — the flink-formats/flink-avro analog (reference
  * flink-formats/flink-avro/src/main/java/org/apache/flink/formats/avro/
  * AvroInputFormat.java / AvroOutputFormat.java: container-file read/write
  * with GenericRecord ⇄ row conversion).
  *
  * The spark-avro connector module is not on this classpath, but the Avro
  * CORE and MAPRED jars ship with Spark itself — so the format is built
  * directly on them, the same layer the reference builds on:
  *  - READ: `binaryFiles` (one task per container file — Avro files
  *    deflate-compress per block and the connector also parallelizes
  *    per-file for unsplittable codecs) → `DataFileStream` →
  *    GenericRecord → Row, schema taken from the first file's header on
  *    the driver and each task re-parsing it from JSON (Schema is not
  *    serialization-stable across avro versions).
  *  - WRITE: `saveAsHadoopFile` with avro-mapred's `AvroOutputFormat` —
  *    the Hadoop committer path, so cluster writes get the normal
  *    task-attempt/commit semantics (no executor-local-file trap).
  *
  * Type surface: boolean/int/long/float/double/string/bytes + nullable
  * unions + timestamp-micros logical (what the star schema needs), PLUS
  * nested records → struct, arrays → array, and string-keyed maps → map,
  * recursively — the same nested shapes the reference's
  * AvroRowDeserializationSchema.java `convertAvroType` handles — PLUS
  * ENUM → string and FIXED → binary exactly as the reference decodes them
  * (AvroRowDeserializationSchema.java:224 enum symbol → its string name,
  * :259 fixed → its bytes). Both are READ-side widenings: the write path
  * generates schemas from Spark types, which have no enum/fixed, so a
  * round-tripped enum comes back as a plain string column (lossy by type,
  * never by value).
  *
  * LOGICAL types follow AvroSchemaConverter.java:118-148 — `decimal` on
  * bytes OR fixed → DecimalType(precision, scale) (value decode is the
  * reference's convertToDecimal: `new BigDecimal(new BigInteger(bytes),
  * scale)`), `date` on int → DateType (epoch-day, the reference's
  * Calcite-adopted local-date), `timestamp-millis` on long →
  * TimestampType (the reference's only timestamp logical; our
  * `timestamp-micros` support is a widening — both map to TimestampType
  * and the decoder picks the unit from the field's Avro schema). Spark
  * keeps timestamps as instants where the reference shifts into JVM-local
  * wall time for its SQL_TIMESTAMP — same point on the time line, session
  * timezone applies at display. `time-millis` is a NAMED rejection: Spark
  * has no TIME-of-day type (the reference maps it to SQL_TIME). DateType
  * and DecimalType write back as `date`-logical int / `decimal`-logical
  * bytes; decimal into a FIXED field is a named write-side rejection
  * (size-padding convention is the user's call, not ours). Unions of
  * several non-null branches remain rejected loudly (the reference drops
  * them to Kryo GENERIC — no relational analog there either,
  * AvroSchemaConverter.java:113-115). */
object Avro {

  /** Avro schema → Spark schema. Fields may be primitive, nested record /
    * array / map, or a `union(null, T)` of any of those (→ nullable). */
  def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"expected record schema, got ${s.getType}")
    sparkType(s).asInstanceOf[StructType]
  }

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(branches.size <= 2 && nonNull.size == 1,
        s"only union(null, T) supported, got $s")
      (nonNull.head, branches.size == 2)
    } else (s, false)

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.TimeMillis])
        sys.error("avro time-millis has no Spark analog (no TIME-of-day " +
          "type; the reference maps it to SQL_TIME) — store it as a plain " +
          "int of millis-since-midnight")
      else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] ||
          s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis]) TimestampType
      else LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (ft, nullable) = unwrap(f.schema())
        StructField(f.name(), sparkType(ft), nullable)
      })
    case Schema.Type.ARRAY =>
      val (et, n) = unwrap(s.getElementType)
      ArrayType(sparkType(et), containsNull = n)
    case Schema.Type.MAP =>
      val (vt, n) = unwrap(s.getValueType)
      MapType(StringType, sparkType(vt), valueContainsNull = n)
    case Schema.Type.ENUM  => StringType // the symbol name, as the reference decodes
    case Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType // the raw bytes, as the reference decodes
    }
    case t => sys.error(s"unsupported avro type $t (multi-branch " +
      "unions have no Spark analog)")
  }

  /** Spark schema → Avro record schema; every field/element a nullable
    * union (the write-side convention — nullability is not narrowed).
    * Nested record names are the field path (avro names must be unique
    * within a schema). */
  def toAvroSchema(st: StructType, name: String): Schema =
    avroBase(st, name).asInstanceOf[Schema]

  private def nullableUnion(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def avroBase(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case dt: DecimalType =>
      LogicalTypes.decimal(dt.precision, dt.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType =>
      val fields = SchemaBuilder.record(path).namespace("graft").fields()
      st.fields.foldLeft(fields) { (fb, f) =>
        fb.name(f.name).`type`(nullableUnion(
          avroBase(f.dataType, s"${path}_${f.name}"))).withDefault(null)
      }.endRecord()
    case ArrayType(et, _) =>
      Schema.createArray(nullableUnion(avroBase(et, s"${path}_item")))
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullableUnion(avroBase(vt, s"${path}_value")))
    case t => sys.error(s"unsupported Spark type $t for avro write")
  }

  /** Read every `.avro` container file under `dir` as a DataFrame. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val glob = s"$dir/*.avro"
    // driver: one header read for the schema
    val first = spark.sparkContext.binaryFiles(glob).first()._2
    val headStream = new DataFileStream[GenericRecord](
      first.open(), new GenericDatumReader[GenericRecord]())
    val schemaJson = try headStream.getSchema.toString finally headStream.close()
    val st = toStructType(new Schema.Parser().parse(schemaJson))
    val tz = st.fields.map(_.dataType) // captured cheaply by the closure
    val rdd = spark.sparkContext.binaryFiles(glob).flatMap { case (path, pds) =>
      val reader = new DataFileStream[GenericRecord](
        pds.open(), new GenericDatumReader[GenericRecord]())
      // the eager close in hasNext only fires on a full drain — register a
      // task-completion close so limit/take/first and task errors don't
      // leak the underlying file handle (close() is idempotent)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.close()))
      // every file decodes positionally against the driver schema (taken
      // from the first file's header) — reject a mixed-schema directory
      // loudly instead of silently mis-decoding columns
      if (reader.getSchema.toString != schemaJson)
        sys.error(s"avro schema mismatch in $path: file header schema " +
          s"${reader.getSchema} differs from the directory schema $schemaJson")
      val fieldSchemas = reader.getSchema.getFields.asScala.toIndexedSeq
        .map(f => unwrap(f.schema())._1)
      new Iterator[Row] {
        def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(tz.indices.map(i => fromAvro(rec.get(i), tz(i), fieldSchemas(i))))
        }
      }
    }
    spark.createDataFrame(rdd, st)
  }

  /** Avro value → external Row value. `s` is the field's Avro schema with
    * any nullable union already unwrapped — the Spark type alone cannot
    * distinguish timestamp-millis from -micros (both TimestampType), so
    * the unit comes from the schema's logical type. */
  private def fromAvro(v: Any, dt: DataType, s: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) =>
      e.toString // enum → its symbol name (reference :224)
    case (s: CharSequence, StringType) => s.toString
    case (f: org.apache.avro.generic.GenericFixed, _: DecimalType) =>
      decodeDecimal(f.bytes(), s) // reference convertToDecimal on fixed
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) =>
      f.bytes().clone() // fixed → raw bytes (reference :259); clone — avro reuses buffers
    case (b: ByteBuffer, _: DecimalType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      decodeDecimal(a, s) // reference convertToDecimal on bytes
    case (b: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (days: java.lang.Integer, DateType) =>
      // epoch-day → the same calendar date the reference's Calcite-adopted
      // local-tz shift lands on (convertToDate)
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (t: java.lang.Long, TimestampType)
        if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(t))
    case (micros: java.lang.Long, TimestampType) =>
      // split micros into (seconds, nanos-of-second) — `micros * 1000`
      // nanoseconds overflows Long past ~year 2262 / before ~1677
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    case (rec: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
        fromAvro(rec.get(i), f.dataType, unwrap(s.getFields.get(i).schema())._1) })
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      val es = unwrap(s.getElementType)._1
      c.asScala.toSeq.map(fromAvro(_, et, es))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      val vs = unwrap(s.getValueType)._1
      m.asScala.map { case (k, x) => k.toString -> fromAvro(x, vt, vs) }.toMap
    case (x, _) => x
  }

  private def decodeDecimal(bytes: Array[Byte], s: Schema): java.math.BigDecimal =
    new java.math.BigDecimal(new java.math.BigInteger(bytes),
      s.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale)

  /** Write `df` as Avro container files under `dir` through the Hadoop
    * committer (`AvroOutputFormat`) — correct on a real cluster, not just
    * local mode. The schema is generated from the Spark schema (every
    * field a nullable union); to target ENUM/FIXED fields, pass the
    * schema explicitly via the two-argument overload. */
  def write(df: DataFrame, dir: String): Unit =
    writeAs(df, dir, toAvroSchema(df.schema, "graft_record").toString)

  /** Write with a USER-SUPPLIED Avro schema — the reference
    * `AvroOutputFormat` contract (the writer takes the target schema,
    * which may use types Spark's own don't distinguish): a string column
    * may target an ENUM field (each value validated against the symbol
    * set at write time) and a binary column a FIXED field (size-checked).
    * The frame's Spark types must equal the schema's DECODED shape
    * ([[toStructType]] — enum reads back as string, fixed as binary), so
    * read(write(df, schema)) round-trips by construction. */
  def writeAs(df: DataFrame, dir: String, avroSchemaJson: String): Unit = {
    val schema = new Schema.Parser().parse(avroSchemaJson)
    val decoded = toStructType(schema)
    // nullability-insensitive compare: the write path union-wraps every
    // field, so the decoded shape is all-nullable regardless of the frame
    def norm(dt: DataType): DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map(f => StructField(f.name, norm(f.dataType))))
      case ArrayType(et, _) => ArrayType(norm(et), containsNull = true)
      case MapType(k, v, _) => MapType(norm(k), norm(v), valueContainsNull = true)
      case t => t
    }
    require(decoded.fields.map(f => (f.name, norm(f.dataType))).sameElements(
        df.schema.fields.map(f => (f.name, norm(f.dataType)))),
      s"schema mismatch: the avro schema decodes to $decoded but the " +
        s"frame is ${df.schema} (names and types must match positionally; " +
        "enum fields take string columns, fixed fields binary columns)")
    writeRecords(df, dir, avroSchemaJson)
  }

  private def writeRecords(df: DataFrame, dir: String, schemaJson: String): Unit = {
    val conf = new JobConf(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputSchema(conf, new Schema.Parser().parse(schemaJson))
    // we hand the writer fully-built GenericRecords — the default REFLECT
    // data model tries to reflect element classes inside union-typed
    // arrays and NPEs; the GENERIC model writes them as-is
    AvroJob.setDataModelClass(conf, classOf[GenericData])
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map { r =>
        (new AvroWrapper[GenericRecord](rowToRecord(r, schema)), NullWritable.get())
      }
    }.saveAsHadoopFile(dir, classOf[AvroWrapper[GenericRecord]],
      classOf[NullWritable], classOf[AvroOutputFormat[GenericRecord]], conf)
  }

  private def rowToRecord(r: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvro(if (r.isNullAt(i)) null else r.get(i), f.schema()))
    }
    rec
  }

  /** Spark value → Avro value against the TARGET field schema (nested
    * records/arrays/maps need the schema to build their containers). */
  private def toAvro(v: Any, s: Schema): Any =
    if (v == null) null
    else {
      val base = if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
      (v, base.getType) match {
        case (s: String, Schema.Type.ENUM) =>
          if (!base.hasEnumSymbol(s)) sys.error(
            s"'$s' is not a symbol of enum ${base.getFullName} ${base.getEnumSymbols}")
          new GenericData.EnumSymbol(base, s)
        case (b: Array[Byte], Schema.Type.FIXED) =>
          if (b.length != base.getFixedSize) sys.error(
            s"fixed ${base.getFullName} needs ${base.getFixedSize} bytes, got ${b.length}")
          new GenericData.Fixed(base, b)
        case (r: Row, Schema.Type.RECORD) => rowToRecord(r, base)
        case (xs: scala.collection.Seq[_], Schema.Type.ARRAY) =>
          // GenericData.Array carries its schema — the mapred writer would
          // otherwise try to REFLECT the element class of a plain List and
          // NPE on union-typed elements
          val out = new GenericData.Array[Any](xs.length, base)
          xs.foreach(x => out.add(toAvro(x, base.getElementType)))
          out
        case (m: scala.collection.Map[_, _], Schema.Type.MAP) =>
          val out = new java.util.HashMap[String, Any](m.size)
          m.foreach { case (k, x) => out.put(k.toString, toAvro(x, base.getValueType)) }
          out
        case (b: Array[Byte], _) => ByteBuffer.wrap(b)
        case (t: java.sql.Timestamp, _) =>
          // unit from the TARGET schema's logical type: a user-supplied
          // writeAs schema may declare timestamp-millis — writing micros
          // there would be a silent 1000× corruption
          if (base.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis])
            t.getTime
          else t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        case (d: java.sql.Date, _) =>
          Math.toIntExact(d.toLocalDate.toEpochDay) // date logical: epoch days
        case (bd: java.math.BigDecimal, Schema.Type.BYTES) =>
          // decimal logical on bytes: two's-complement unscaled value at the
          // SCHEMA's scale (the frame's DecimalType scale by construction)
          val scale = base.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale
          ByteBuffer.wrap(bd.setScale(scale).unscaledValue().toByteArray)
        case (_: java.math.BigDecimal, Schema.Type.FIXED) => sys.error(
          "decimal into a FIXED field is not supported on the write side " +
            "(pick the bytes spelling; fixed-size sign-extension padding is " +
            "a corpus convention, not ours) — reads of fixed+decimal work")
        case (x, _) => x
      }
    }

  // ------------------------------------------------------------------
  // Single-record binary SERDE — the reference's Kafka wire-format half
  // of flink-avro (AvroRowSerializationSchema.java /
  // AvroRowDeserializationSchema.java): one schemaless avro-binary blob
  // per message, schema agreed out of band. Implemented as
  // mapPartitions (one decoder per partition, reused across rows — the
  // multimodal-decoder tier; no builtin exists without the connector),
  // so both work UNCHANGED on streaming DataFrames between
  // decodeKafka/encodeKafka.
  // ------------------------------------------------------------------

  /** All columns of `df` → one avro-binary `value` column (plus any
    * `keep` columns carried through untouched, e.g. a Kafka key/ts). */
  def encodeRecords(df: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val payload = StructType(df.schema.filterNot(f => keep.contains(f.name)))
    val schemaJson = toAvroSchema(payload, "graft_record").toString
    val idx = payload.fields.map(f => df.schema.fieldIndex(f.name))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val outSchema = StructType(keep.map(df.schema(_)) :+
      StructField("value", BinaryType, nullable = false))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema)
      val out = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      rows.map { r =>
        out.reset()
        encoder = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, encoder)
        val rec = new GenericData.Record(schema)
        payload.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(if (r.isNullAt(idx(i))) null else r.get(idx(i)),
            schema.getFields.get(i).schema()))
        }
        writer.write(rec, encoder)
        encoder.flush()
        Row.fromSeq(keepIdx.map(r.get) :+ out.toByteArray)
      }
    }
  }

  /** Avro-binary `valueCol` → the record's columns (schema agreed out of
    * band, exactly the reference's deserialization-schema contract);
    * `keep` columns carried through. */
  def decodeRecords(df: DataFrame, schemaJson: String,
                    valueCol: String = "value", keep: Seq[String] = Nil): DataFrame = {
    val payload = toStructType(new Schema.Parser().parse(schemaJson))
    val vIdx = df.schema.fieldIndex(valueCol)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val outSchema = StructType(keep.map(df.schema(_)) ++ payload.fields)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fieldSchemas = schema.getFields.asScala.toIndexedSeq
        .map(f => unwrap(f.schema())._1)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      var rec: GenericRecord = null
      rows.map { r =>
        decoder = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(r.getAs[Array[Byte]](vIdx), decoder)
        rec = reader.read(rec, decoder)
        Row.fromSeq(keepIdx.map(r.get) ++
          payload.fields.zipWithIndex.map { case (f, i) =>
            fromAvro(rec.get(i), f.dataType, fieldSchemas(i)) })
      }
    }
  }
}
