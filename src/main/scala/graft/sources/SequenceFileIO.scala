package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

import org.apache.hadoop.io.{BytesWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat
import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SequenceFile read/write (SURVEY.md §2.2; Hive
  * `HiveSequenceFileOutputFormat` + `LazySimpleSerDe`,
  * `QL/io/HiveSequenceFileOutputFormat.java`): rows are stored as an
  * EMPTY `BytesWritable` key and a `Text` value of `\u0001`-delimited
  * fields with `\N` for NULL — the exact on-disk shape of a Hive
  * `STORED AS SEQUENCEFILE` table with default serde properties.
  *
  * Schema is caller-supplied on read (schema-on-read from the
  * metastore, §1.3 — a delimited SequenceFile carries no schema).
  * Flat Hive-style rows: primitives, string, decimal, date, timestamp.
  * Timestamps WRITE as fixed `yyyy-MM-dd HH:mm:ss.SSSSSS` wall-clock in
  * UTC (the session timezone fixed by build.sbt, matching Hive's
  * TZ-less timestamp semantics); READ accepts 0-9 fraction digits,
  * because Hive's `TimestampWritable` trims trailing zeros and omits
  * the fraction entirely for whole seconds — a genuine Hive-written
  * table has variable-width fractions.
  *
  * Scale shape: both directions are narrow per-partition converters
  * with no shuffle — one output file per task on write, Hadoop splits
  * on read (SequenceFile sync markers make it splittable, the reason
  * Hive preferred it over raw text). Values that contain the field
  * delimiter fail LOUDLY on write instead of corrupting the row
  * (LazySimpleSerDe's optional escaping is off by default and silently
  * mangles such rows — we refuse instead). Embedded newlines are FINE
  * here, unlike TextFile: SequenceFile Text records are
  * length-prefixed, so a newline cannot split a row, and Hive itself
  * preserves them in SEQUENCEFILE tables.
  */
object SequenceFileIO {

  val NullToken = "\\N"

  private val TsFmt = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  /** Lenient read-side twin of [[TsFmt]]: Hive's TimestampWritable
    * writes `HH:mm:ss` for whole seconds and trims trailing fraction
    * zeros otherwise, so the fraction is 0-9 digits and optional. */
  private val TsParse = new DateTimeFormatterBuilder()
    .appendPattern("uuuu-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(ChronoField.NANO_OF_SECOND, 0, 9, true)
    .optionalEnd()
    .toFormatter()

  private[graft] def toText(v: Any, dt: DataType, sep: Char): String = (v, dt) match {
    case (null, _) => NullToken
    case (s: String, StringType) =>
      // newlines are deliberately NOT rejected: SequenceFile records are
      // length-prefixed (a newline cannot split a row) and Hive preserves
      // them in SEQUENCEFILE tables — only the field delimiter is unsafe
      require(s.indexOf(sep) < 0,
        s"string value contains the field delimiter; " +
          "choose another delimiter (LazySimpleSerDe escaping is not emulated)")
      require(s != NullToken,
        s"string value equals the null token $NullToken and would read " +
          "back as NULL; this format cannot carry it")
      s
    case (t: java.sql.Timestamp, TimestampType) =>
      TsFmt.format(LocalDateTime.ofInstant(t.toInstant, ZoneOffset.UTC))
    case (t: Instant, TimestampType) =>
      TsFmt.format(LocalDateTime.ofInstant(t, ZoneOffset.UTC))
    case (t: LocalDateTime, TimestampNTZType) => TsFmt.format(t)
    case (d: java.sql.Date, DateType) => d.toLocalDate.toString
    case (d: LocalDate, DateType) => d.toString
    case (b: java.math.BigDecimal, _: DecimalType) => b.toPlainString
    case (other, _) => other.toString // Long/Int/Short/Byte/Double/Float/Boolean
  }

  private[graft] def fromText(s: String, dt: DataType, java8: Boolean): Any =
    if (s == NullToken) null
    else dt match {
      case StringType => s
      case LongType => s.toLong
      case IntegerType => s.toInt
      case ShortType => s.toShort
      case ByteType => s.toByte
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s.toBoolean
      case d: DecimalType =>
        new java.math.BigDecimal(s).setScale(d.scale)
      case TimestampType =>
        val inst = LocalDateTime.parse(s, TsParse).toInstant(ZoneOffset.UTC)
        if (java8) inst else java.sql.Timestamp.from(inst)
      case TimestampNTZType => LocalDateTime.parse(s, TsParse)
      case DateType =>
        val ld = LocalDate.parse(s)
        if (java8) ld else java.sql.Date.valueOf(ld)
      case other =>
        throw new IllegalArgumentException(
          s"SequenceFileIO supports flat Hive-style schemas; unsupported type: $other")
    }

  /** Types this serde carries; everything else must fail at write() time
    * on the driver, not fall through toString into unreadable rows. */
  private def supported(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | TimestampType |
         TimestampNTZType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  private def checkSchema(schema: StructType): Unit = {
    val bad = schema.fields.filterNot(f => supported(f.dataType))
    require(bad.isEmpty,
      "SequenceFileIO supports flat Hive-style schemas; unsupported " +
        s"fields: ${bad.map(f => s"${f.name}: ${f.dataType}").mkString(", ")}")
  }

  /** Write `df` under `path` as Hive-shaped SequenceFiles (one per task). */
  def write(df: DataFrame, path: String, sep: Char = '\u0001'): Unit = {
    val structType = df.schema
    checkSchema(structType)
    val sepStr = sep.toString
    df.rdd.mapPartitions { rows =>
      val emptyKey = new BytesWritable()
      rows.map { row =>
        val line = structType.fields.indices.iterator
          .map(i => toText(row.get(i), structType(i).dataType, sep))
          .mkString(sepStr)
        (emptyKey, new Text(line))
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[BytesWritable], classOf[Text],
      classOf[SequenceFileOutputFormat[BytesWritable, Text]])
  }

  /** Read the SequenceFiles under `path` with the given schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
           sep: Char = '\u0001'): DataFrame = {
    checkSchema(schema)
    val java8 = spark.conf
      .getOption("spark.sql.datetime.java8API.enabled").exists(_.toBoolean)
    val sepRe = java.util.regex.Pattern.quote(sep.toString)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[SequenceFileInputFormat[BytesWritable, Text]],
        classOf[BytesWritable], classOf[Text],
        spark.sparkContext.hadoopConfiguration)
      .map { case (_, v) =>
        // convert IMMEDIATELY: the record reader reuses the Text object
        val parts = v.toString.split(sepRe, -1)
        require(parts.length == schema.length,
          s"row has ${parts.length} fields, schema expects ${schema.length}")
        Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
          fromText(parts(i), f.dataType, java8)
        }.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }
}
