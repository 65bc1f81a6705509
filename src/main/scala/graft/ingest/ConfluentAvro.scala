package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.GenericDatumReader
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * S1 — the Avro source decode, Spark-natively (reference:
 * convert/.../TombstoneAwareAvroConverter.java:26-31 plus the Confluent
 * wire format used by the registry stack: 1 magic byte 0x0 + 4-byte
 * schema id + Avro binary body).
 *
 * [[ConfluentAvroDecode]] is a Catalyst `Expression` (not a Scala UDF):
 * the Avro `Schema`/`GenericDatumReader` are built once per executor via
 * transient-lazy fields — the plan ships only the schema JSON string.
 * CodegenFallback is deliberate: the body is a library decode call with
 * nothing for codegen to fuse; surrounding expressions stay inside
 * whole-stage codegen.
 *
 * The tombstone rule composes OUTSIDE the decode, exactly like the
 * reference (null check precedes decode — the converter filters
 * `SchemaAndValue.NULL` before ever touching Avro): see [[decodeOrTombstone]].
 */
case class ConfluentAvroDecode(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader: GenericDatumReader[Any] =
    new GenericDatumReader[Any](schema)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 5 || bytes(0) != 0)
      throw new IllegalArgumentException(
        s"not Confluent wire format (len=${bytes.length})")
    val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    // GenericRecord.toString emits the record as JSON (Avro spec encoding)
    UTF8String.fromString(String.valueOf(reader.read(null, dec)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "confluent_avro_decode"
}

object ConfluentAvro {

  /** Column wrapper for [[ConfluentAvroDecode]] (Spark 4's classic-module
    * bridge from a Catalyst Expression to a public Column). */
  def decodeJson(value: Column, schemaJson: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ConfluentAvroDecode(
        org.apache.spark.sql.GraftColumnBridge.expression(value),
        schemaJson))

  /**
   * Avro schema → Spark type, covering the Avro primitives + records +
   * nullable unions (everything the reference's sample schemas and plain
   * registry usage produce; Foo.avsc / Bar.avsc use string+int).
   */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.ARRAY   => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP     => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD  =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), sparkType(f.schema()))))
    case Schema.Type.UNION   =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"unsupported union: $s")
      sparkType(branches.head)
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /**
   * Full decode of a framed-Avro `value` column into a typed struct, with
   * the reference's tombstone substitution: null value → the sentinel in
   * the JSON field, never a decode attempt (S1 ordering).
   * Returns (structCol, jsonCol).
   */
  def decodeOrTombstone(value: Column, schemaJson: String): (Column, Column) = {
    val schema = new Schema.Parser().parse(schemaJson)
    val st = sparkType(schema) match {
      case s: StructType => s
      case other => StructType(Seq(StructField("value", other)))
    }
    val json = when(value.isNull, lit(graft.model.Envelope.Tombstone))
      .otherwise(decodeJson(value, schemaJson))
    val struct = when(value.isNull, lit(null).cast(st))
      .otherwise(from_json(decodeJson(value, schemaJson), st))
    (struct, json)
  }
}
