package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.Envelope

/**
 * Composable record transforms — the Spark-native equivalent of the
 * reference's Kafka Connect SMT chain (reference: kafana.http:79-93, applied
 * left-to-right). Each transform is a `DataFrame => DataFrame` over the
 * record frame `(key, value: struct?, topic, partition, offset, timestamp)`;
 * chains compose with [[Transforms.chain]] exactly like Connect's
 * `transforms=insertvalue,hoistfield,...` list.
 *
 * Unlike the reference's per-record Java (with its 16-entry derived-schema
 * LRU cache, reference: transform/.../InsertKey.java:57,91-95), these are
 * plan-time column expressions: the widened schema is resolved ONCE by the
 * Catalyst analyzer and the per-row work is whole-stage-codegen'd. There is
 * nothing to cache and no per-record driver involvement — the same plan
 * runs unchanged on a 1000-executor cluster.
 */
object Transforms {

  type Transform = DataFrame => DataFrame

  /** Left-to-right composition, mirroring Connect SMT chain order. */
  def chain(ts: Transform*): Transform = ts.reduceLeft(_ andThen _)

  private def requireField(name: String, what: String): Unit =
    require(name != null && name.nonEmpty,
      s"$what: field name must be configured (reference fails the same way: " +
        "transform/.../InsertKey.java:64-66)")

  /**
   * T1 — InsertValueAsString: append a field holding the entire record value
   * serialized as a JSON string (reference:
   * transform/.../InsertValueAsString.java:99-127 struct path, :129-141
   * primitive path; JSON emitted without schema envelope per :47-52).
   *
   * Tombstones: a null `value` produces the sentinel string instead of JSON
   * (composition of the reference's converter S1, which substitutes
   * "TOMBSTONE" BEFORE the SMT chain —
   * convert/.../TombstoneAwareAvroConverter.java:26-31). Spark columns are
   * statically typed, so the struct-or-sentinel union is realized as: payload
   * fields all-null + json field = "TOMBSTONE".
   *
   * The configured field name must not collide with a payload field — the
   * reference would fail identically (Connect `Struct` forbids duplicate
   * field names when deriving the widened schema,
   * InsertValueAsString.java:143-152).
   */
  def insertValueAsString(field: String): Transform = { df =>
    requireField(field, "insertValueAsString")
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val valueType = df.schema("value").dataType
    val payloadFields: Seq[String] = valueType match {
      case s: StructType => s.fieldNames.toSeq
      case _             => Seq.empty // non-struct value: wrap into 1-field struct
    }
    require(!payloadFields.contains(field),
      s"insertValueAsString: field '$field' collides with a payload field")
    // Struct/map/array payloads serialize as JSON (the schemaless Map path of
    // the reference, InsertValueAsString.java:92-97, upgraded from toString to
    // real JSON); primitives serialize as their bare string form (matching the
    // schemas-disabled JsonConverter, InsertValueAsString.java:47-52,116-121).
    val serialized = valueType match {
      case _: StructType | _: MapType | _: ArrayType => to_json(col("value"))
      case _ => col("value").cast("string")
    }
    val json = when(col("value").isNull, lit(Envelope.Tombstone))
      .otherwise(serialized)
    val widened = struct(
      payloadFields.map(f => col(s"value.`$f`").as(f)) :+ json.as(field): _*)
    df.withColumn("value", widened)
  }

  /**
   * T2 — HoistField: wrap the whole value into a single-field struct
   * `{<field>: value}` (reference: stock Connect `HoistField$Value`,
   * configured at kafana.http:82-83 with field=message).
   */
  def hoistField(field: String = "message"): Transform = { df =>
    requireField(field, "hoistField")
    df.withColumnRenamed("value", field)
  }

  /**
   * T3–T6 — InsertField ×4: surface record metadata (timestamp, topic,
   * partition, offset) as top-level fields (reference: kafana.http:84-91).
   * Spark's source frame already carries these columns, so this transform
   * only fixes their position/order — the reference pays per-record schema
   * widening for the same result.
   */
  def insertMetadata(hoistedField: String = "message"): Transform = { df =>
    df.select(
      col(hoistedField),
      col("timestamp"), col("topic"), col("partition"), col("offset"),
      col("key"))
  }

  /**
   * T7 — InsertKey: surface the record key as a value field, PRESERVING
   * the key's schema like the reference (transform/.../InsertKey.java:88-119
   * derives the inserted field's schema from the key schema — Struct keys
   * stay Structs; configured at kafana.http:92-93 with key.field=key).
   *
   * Primitive keys are cast to string (the envelope's search contract —
   * `key` is matched as text in Q2/Q3). Composite (struct) keys keep BOTH
   * representations: `<field>` carries the canonical JSON rendering so the
   * string-search surface still works across topics, and `<field>_typed`
   * carries the struct unchanged for typed predicates/joins on key parts —
   * the two-sided contract a relational engine needs where Connect just
   * forwards the Struct.
   */
  def insertKey(field: String = "key"): Transform = { df =>
    requireField(field, "insertKey")
    df.schema("key").dataType match {
      case _: StructType =>
        // typed copy FIRST — when field == "key" the second withColumn
        // replaces the struct with its JSON rendering
        df.withColumn(s"${field}_typed", col("key"))
          .withColumn(field, to_json(col("key")))
      case _ =>
        df.withColumn(field, col("key").cast("string"))
    }
  }

  /** Append the changelog identity column (reference: README.md:11). */
  def withUid: Transform = _.withColumn("uid", Envelope.uid)

  /**
   * The reference's full ingest enrichment (converter + 7-stage SMT chain +
   * sink id), as one composed transform.
   */
  def enrich(valueJsonField: String): Transform = chain(
    insertValueAsString(valueJsonField),
    hoistField("message"),
    insertMetadata("message"),
    insertKey("key"),
    withUid
  )
}
