package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.file.DataFileReader
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro read/write (SURVEY.md §2.2) built directly on the avro-core /
  * avro-mapred jars that DO ship with this Spark distro — the
  * `spark-avro` module is absent, which round 1-2 recorded as an
  * environment block. This closes the gap for the schemas a Hive 1.2
  * Avro table actually uses: flat records of primitives, strings,
  * binary, date/timestamp (logical types), and one-level arrays, all
  * nullable via `["null", T]` unions.
  *
  * Scale shape: both directions are narrow per-partition converters —
  * the write is `df.rdd.mapPartitions` into `AvroKeyOutputFormat` (one
  * .avro container per task, no shuffle), the read is
  * `newAPIHadoopFile(AvroKeyInputFormat)` with per-record conversion to
  * `Row` BEFORE the iterator advances (the Avro record reader reuses its
  * datum object). The file schema is read from one container header on
  * the driver; records decode with their writer schema.
  */
object AvroIO {

  /** Catalyst → Avro schema (nullable union per field). */
  def toAvroSchema(schema: StructType, recordName: String): Schema = {
    def field(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case ArrayType(et, _) => Schema.createArray(nullable(field(et)))
      case other => throw new IllegalArgumentException(
        s"AvroIO supports flat Hive-style schemas; unsupported type: $other")
    }
    def nullable(s: Schema): Schema =
      Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name, nullable(field(f.dataType)), null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Avro → Catalyst schema (unwrapping nullable unions). */
  def toStructType(schema: Schema): StructType = {
    def unwrap(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
      else s
    def dt(s0: Schema): DataType = {
      val s = unwrap(s0)
      (s.getType, Option(s.getLogicalType).map(_.getName).orNull) match {
        case (Schema.Type.LONG, "timestamp-micros") => TimestampType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.INT, "date") => DateType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.BYTES, _) => BinaryType
        case (Schema.Type.ARRAY, _) => ArrayType(dt(s.getElementType))
        case (t, _) => throw new IllegalArgumentException(s"unsupported Avro type: $t")
      }
    }
    StructType(schema.getFields.asScala.map(f =>
      StructField(f.name(), dt(f.schema()), nullable = true)).toArray)
  }

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    // rows carry java.time types when spark.sql.datetime.java8API.enabled
    case (t: java.time.Instant, TimestampType) =>
      Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L)
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      seq.map(toAvroValue(_, et)).asJava
    case (other, _) => other // Long/Int/Double/Float/Boolean/String pass through
  }

  private def fromAvroValue(v: Any, dt: DataType, java8: Boolean): Any = (v, dt) match {
    case (null, _) => null
    case (cs: CharSequence, StringType) => cs.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case (l: java.lang.Long, TimestampType) if java8 =>
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
    case (l: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt); ts
    case (i: java.lang.Integer, DateType) if java8 =>
      java.time.LocalDate.ofEpochDay(i.toLong)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      c.asScala.map(fromAvroValue(_, et, java8)).toSeq
    case (other, _) => other
  }

  /** Write `df` as Avro container files under `path` (one per task). */
  def write(df: DataFrame, path: String): Unit = {
    val structType = df.schema
    val schemaJson = toAvroSchema(structType, "graft_row").toString // Schema isn't serializable
    val spark = df.sparkSession
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < structType.length) {
          rec.put(i, toAvroValue(row.get(i), structType(i).dataType))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read the Avro container files under `path` into a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val sample = fs.listStatus(dir).map(_.getPath)
      .find(_.getName.endsWith(".avro"))
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val reader = DataFileReader.openReader(
      new FsInput(sample, conf), new GenericDatumReader[GenericRecord]())
    val avroSchema = try reader.getSchema finally reader.close()
    val structType = toStructType(avroSchema)
    // createDataFrame expects Instant/LocalDate externals under the
    // java8 datetime API; capture the flag outside the closure
    val java8 = spark.conf
      .getOption("spark.sql.datetime.java8API.enabled").exists(_.toBoolean)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .map { case (k, _) =>
        // convert IMMEDIATELY: the record reader reuses the datum object
        val rec = k.datum()
        Row.fromSeq(structType.fields.zipWithIndex.map { case (f, i) =>
          fromAvroValue(rec.get(i), f.dataType, java8)
        }.toIndexedSeq)
      }
    spark.createDataFrame(rows, structType)
  }
}
