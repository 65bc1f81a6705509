package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/**
 * S2 — the serialization side of the reference's converter
 * (convert/.../TombstoneAwareAvroConverter.java:21-23 delegates to the
 * Confluent AvroConverter): a typed struct column → Confluent-framed
 * Avro binary (magic 0x0 + 4-byte schema id + Avro body). Needed only
 * when writing back to Kafka; implemented for converter symmetry and
 * round-trip testing with [[ConfluentAvroDecode]].
 */
case class ConfluentAvroEncode(child: Expression, schemaJson: String,
    schemaId: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer =
    new GenericDatumWriter[Any](schema)

  private def toAvro(value: Any, avro: Schema, spark: DataType): Any = {
    if (value == null) return null
    import org.apache.avro.LogicalTypes
    (avro.getType, avro.getLogicalType) match {
      // logical types first — mirror of ConfluentAvro.toCatalyst
      case (carrier, d: LogicalTypes.Decimal) =>
        val unscaled = value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.setScale(d.getScale).unscaledValue.toByteArray
        if (carrier == Schema.Type.FIXED) {
          val padded = new Array[Byte](avro.getFixedSize)
          val sign: Byte = if (unscaled.head < 0) -1 else 0
          java.util.Arrays.fill(padded, sign)
          System.arraycopy(unscaled, 0, padded,
            padded.length - unscaled.length, unscaled.length)
          new GenericData.Fixed(avro, padded)
        } else ByteBuffer.wrap(unscaled)
      case (Schema.Type.INT, _: LogicalTypes.Date) => value // days both sides
      case (Schema.Type.LONG, _: LogicalTypes.TimestampMillis) =>
        // floorDiv, not /: pre-epoch timestamps with sub-ms components must
        // round toward -∞ or decode(encode(x)) drifts by 1ms
        java.lang.Long.valueOf(Math.floorDiv(value.asInstanceOf[Long], 1000L))
      case (Schema.Type.LONG, _: LogicalTypes.TimestampMicros) => value
      case (t, _) => t match {
        case Schema.Type.STRING => value.asInstanceOf[UTF8String].toString
        case Schema.Type.ENUM =>
          new GenericData.EnumSymbol(avro, value.asInstanceOf[UTF8String].toString)
        case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
             Schema.Type.DOUBLE | Schema.Type.BOOLEAN => value
        case Schema.Type.BYTES =>
          ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
        case Schema.Type.FIXED =>
          new GenericData.Fixed(avro, value.asInstanceOf[Array[Byte]])
        case Schema.Type.ARRAY =>
          val ad = value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          val et = spark.asInstanceOf[ArrayType].elementType
          val out = new java.util.ArrayList[Any](ad.numElements())
          (0 until ad.numElements()).foreach(i =>
            out.add(toAvro(ad.get(i, et), avro.getElementType, et)))
          out
        case Schema.Type.MAP =>
          val md = value.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val mt = spark.asInstanceOf[MapType]
          val out = new java.util.HashMap[String, Any](md.numElements())
          val ks = md.keyArray(); val vs = md.valueArray()
          (0 until md.numElements()).foreach { i =>
            out.put(ks.getUTF8String(i).toString,
              toAvro(vs.get(i, mt.valueType), avro.getValueType, mt.valueType))
          }
          out
        case Schema.Type.UNION =>
          val branches = avro.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
          if (branches.size == 1) toAvro(value, branches.head, spark)
          else {
            // struct-of-members (sparkType's union rendering): encode the
            // single non-null member with its branch schema
            val row = value.asInstanceOf[InternalRow]
            val st = spark.asInstanceOf[StructType]
            val i = (0 until row.numFields).find(!row.isNullAt(_)).getOrElse(
              throw new IllegalArgumentException(
                "multi-branch union struct has no non-null member"))
            toAvro(row.get(i, st(i).dataType), branches(i), st(i).dataType)
          }
        case Schema.Type.RECORD =>
          val row = value.asInstanceOf[InternalRow]
          val st = spark.asInstanceOf[StructType]
          val rec = new GenericData.Record(avro)
          avro.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name(),
              toAvro(row.get(i, st(i).dataType), f.schema(), st(i).dataType))
          }
          rec
        case other =>
          throw new IllegalArgumentException(s"unsupported avro type $other")
      }
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val out = new ByteArrayOutputStream()
    out.write(0) // magic byte
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(toAvro(input, schema, child.dataType), enc)
    enc.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "confluent_avro_encode"
}

object ConfluentAvroEncode {
  import org.apache.spark.sql.GraftColumnBridge

  def encode(value: Column, schemaJson: String, schemaId: Int = 1): Column =
    GraftColumnBridge.column(ConfluentAvroEncode(
      GraftColumnBridge.expression(value), schemaJson, schemaId))
}
