package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink (reference
  * `cpp/include/cudf/io/avro.hpp:231` — `read_avro`).
  *
  * The offline build has no `spark-avro` DATASOURCE jar, but Spark's own
  * dependency set ships avro core + `avro-mapred` (the Hadoop
  * input/output formats), which is everything a distributed reader
  * needs: `AvroKeyInputFormat` splits container files by sync marker
  * exactly like the parquet reader splits by row group, so reads scale
  * across executors with no driver bottleneck; writes go through
  * `AvroKeyOutputFormat`, one container file per partition.
  *
  * Supported schema subset (loud `IllegalArgumentException` otherwise):
  * the primitive types (boolean/int/long/float/double/string/bytes,
  * enum and fixed read as string/binary), nullable via ["null", T]
  * unions, arrays, maps with string keys, nested records, the
  * date/timestamp logical types at micros precision (avro `date` ↔
  * DateType, `timestamp-micros` ↔ TimestampType,
  * `local-timestamp-micros` ↔ TimestampNTZType — the engine's µs
  * timestamp contract; millis-precision logical types are rejected
  * loudly rather than silently re-scaled), and `decimal` over
  * bytes/fixed ↔ DecimalType(p, s) — cudf's avro surface is read-only
  * primitives, but DECIMAL32/64/128 is a first-class engine type
  * (SURVEY §1.2), so the decimal contract stays symmetric across all
  * four IO formats (two's-complement big-endian unscaled int per the
  * avro spec).
  */
object Avro {

  // ------------------------------------------------------ schema bridge

  /** avro Schema → Spark DataType (see supported subset above). */
  def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: org.apache.avro.LogicalTypes.Date => (DateType, false)
        case _                                    => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: org.apache.avro.LogicalTypes.TimestampMicros =>
          (TimestampType, false)
        case _: org.apache.avro.LogicalTypes.LocalTimestampMicros =>
          (TimestampNTZType, false)
        case lt if lt != null && lt.getName.endsWith("-millis") =>
          throw new IllegalArgumentException(
            s"unsupported avro logical type (millis precision): $lt — " +
              "only -micros timestamps are read")
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.ENUM    => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = sparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = sparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, n) = sparkType(f.schema())
        StructField(f.name(), dt, nullable = n)
      }
      (StructType(fields.toSeq), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"unsupported avro union with ${branches.size} non-null branches: $s")
      val (dt, _) = sparkType(branches.head)
      (dt, true)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** Spark StructType → avro record Schema; nullable → ["null", T]. */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    def field(dt: DataType, path: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        org.apache.avro.LogicalTypes.localTimestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case dt: DecimalType =>
        org.apache.avro.LogicalTypes.decimal(dt.precision, dt.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, cn) =>
        Schema.createArray(wrap(field(et, path + ".elem"), cn))
      case MapType(StringType, vt, vn) =>
        Schema.createMap(wrap(field(vt, path + ".value"), vn))
      case s: StructType => avroSchema(s, path.replace('.', '_'))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Spark type for avro write at $path: $other")
    }
    def wrap(s: Schema, nullable: Boolean): Schema =
      if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s)
      else s
    val fields = st.fields.toSeq.map { f =>
      new Schema.Field(f.name, wrap(field(f.dataType, f.name), f.nullable),
        null, null.asInstanceOf[AnyRef])
    }
    Schema.createRecord(name, null, "graft", false, fields.asJava)
  }

  // ------------------------------------------------------ value bridge

  /** avro runtime value → Spark external value for `dt`. */
  private def toSpark(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      val micros = l.longValue()
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L))
    case (l: java.lang.Long, TimestampNTZType) =>
      val micros = l.longValue()
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (u: Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (e: AnyRef, StringType) => e.toString // GenericData.EnumSymbol
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (b: java.nio.ByteBuffer, dt: DecimalType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out)
      new java.math.BigDecimal(new java.math.BigInteger(out), dt.scale)
    case (f: org.apache.avro.generic.GenericFixed, dt: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), dt.scale)
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(toSpark(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> toSpark(mv, vt) }.toMap
    case (r: GenericRecord, st: StructType) => recordToRow(r, st)
    case (x, _) => x // boolean/int/long/float/double pass through
  }

  private def recordToRow(r: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) =>
      toSpark(r.get(i), f.dataType)
    })

  /** Spark external value → avro runtime value under `schema`. */
  private def toAvro(v: Any, schema: Schema): AnyRef = {
    if (v == null) return null
    val s =
      if (schema.getType == Schema.Type.UNION)
        schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else schema
    (v, s.getType) match {
      case (d: java.sql.Date, Schema.Type.INT) =>
        java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
      case (d: java.time.LocalDate, Schema.Type.INT) =>
        java.lang.Integer.valueOf(d.toEpochDay.toInt)
      case (t: java.sql.Timestamp, Schema.Type.LONG) =>
        val i = t.toInstant
        java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case (t: java.time.Instant, Schema.Type.LONG) =>
        java.lang.Long.valueOf(t.getEpochSecond * 1000000L + t.getNano / 1000L)
      case (t: java.time.LocalDateTime, Schema.Type.LONG) =>
        val i = t.toInstant(java.time.ZoneOffset.UTC)
        java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case (d: java.math.BigDecimal, Schema.Type.BYTES) =>
        val lt = s.getLogicalType
        require(lt.isInstanceOf[org.apache.avro.LogicalTypes.Decimal],
          s"BigDecimal written to non-decimal avro bytes: $s")
        val scale = lt.asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        // setScale is exact (same scale as the Spark DecimalType the
        // schema was derived from); a mismatch throws rather than rounds
        java.nio.ByteBuffer.wrap(d.setScale(scale).unscaledValue().toByteArray)
      case (b: Array[Byte], Schema.Type.BYTES) => java.nio.ByteBuffer.wrap(b)
      case (seq: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        seq.map(toAvro(_, s.getElementType)).asJava
      case (m: scala.collection.Map[_, _], Schema.Type.MAP) =>
        m.map { case (k, mv) => k.toString -> toAvro(mv, s.getValueType) }.asJava
      case (row: Row, Schema.Type.RECORD) => rowToRecord(row, s)
      case (x: AnyRef, _) => x
      case (x, _) => x.asInstanceOf[AnyRef]
    }
  }

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    val fields = schema.getFields
    var i = 0
    while (i < fields.size()) {
      rec.put(i, toAvro(row.get(i), fields.get(i).schema()))
      i += 1
    }
    rec
  }

  // ------------------------------------------------------------- API

  /** Read `.avro` container files under `path` (file or directory).
    * Schema is taken from the first file's header (one driver-side
    * header read — a few KB, not a data scan); the data read itself is
    * fully distributed via `AvroKeyInputFormat` sync-marker splits.
    */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val firstFile =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p)
          .map(_.getPath)
          .filter(f => f.getName.endsWith(".avro"))
          .sortBy(_.getName)
          .headOption
          .getOrElse(throw new IllegalArgumentException(
            s"no .avro files under $path"))
      else p
    val in = fs.open(firstFile)
    val writerSchema =
      try {
        val r = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        try r.getSchema
        finally r.close()
      } finally in.close()
    require(writerSchema.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got $writerSchema")
    val (dt, _) = sparkType(writerSchema)
    val st = dt.asInstanceOf[StructType]

    val job = Job.getInstance(hadoopConf)
    AvroJob.setInputKeySchema(job, writerSchema)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      // convert eagerly per record — the record reader reuses buffers
      .map { case (k, _) => recordToRow(k.datum(), st) }
    spark.createDataFrame(rdd, st)
  }

  /** Write `df` as avro container files under `path` (one per
    * partition, deflate-compressed), via `AvroKeyOutputFormat`.
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val schema = avroSchema(df.schema)
    val schemaJson = schema.toString // Schema isn't serializable; ship JSON
    val spark = df.sparkSession
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    job.getConfiguration.set("mapreduce.output.fileoutputformat.compress", "true")
    job.getConfiguration.set("avro.output.codec", "deflate")
    df.rdd
      .mapPartitions { rows =>
        val s = new Schema.Parser().parse(schemaJson)
        rows.map(r => (new AvroKey[GenericRecord](rowToRecord(r, s)),
          NullWritable.get()))
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }
}
