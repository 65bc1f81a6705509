package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.Sources
import graft.model.Envelope
import graft.transform.Transforms

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def records = Sources.eventsAsRecords(spark, sf)

  test("record frame has the Kafka-source column contract") {
    val schema = records.schema
    assert(schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp"))
    assert(schema("partition").dataType == IntegerType)
    assert(schema("offset").dataType == LongType)
    assert(schema("timestamp").dataType == TimestampType)
  }

  test("T1 insertValueAsString appends JSON field; tombstones get sentinel") {
    val out = Transforms.insertValueAsString("value_json")(records)
    val vt = out.schema("value").dataType.asInstanceOf[StructType]
    assert(vt.fieldNames.toSeq == Seq("event_type", "value", "props", "value_json"))
    val tomb = out.where($"offset" % Sources.TombstoneEvery === 0)
      .select($"value.value_json").distinct().as[String].collect()
    assert(tomb.toSeq == Seq(Envelope.Tombstone))
    val sample = out.where($"offset" === 1)
      .select($"value.value_json").as[String].head()
    assert(sample.startsWith("{\"event_type\":"))
  }

  test("T1 rejects missing and colliding field names, like the reference") {
    intercept[IllegalArgumentException] {
      Transforms.insertValueAsString("")(records)
    }
    intercept[IllegalArgumentException] {
      // payload already has an `event_type` field
      Transforms.insertValueAsString("event_type")(records)
    }
  }

  test("T1 wraps a primitive (non-struct) value into a 1-field struct") {
    val prim = records.withColumn("value", lit("plain"))
    val out = Transforms.insertValueAsString("value_json")(prim)
    val vt = out.schema("value").dataType.asInstanceOf[StructType]
    assert(vt.fieldNames.toSeq == Seq("value_json"))
    // JSON of a bare string value is the string itself under the json field
    val v = out.select($"value.value_json").as[String].head()
    assert(v.contains("plain"))
  }

  test("T7 insertKey preserves composite (struct) key schemas") {
    // reference InsertKey derives the inserted field's schema from the key
    // schema (InsertKey.java:88-119) — a Struct key must not be flattened
    // to toString(); here it keeps a typed copy plus a canonical JSON
    // rendering for the cross-topic string-search surface
    val structKeyed = records.withColumn("key",
      struct(col("key").as("user"), col("partition").as("shard")))
    val out = Transforms.insertKey("key")(structKeyed)
    val kt = out.schema("key_typed").dataType.asInstanceOf[StructType]
    assert(kt.fieldNames.toSeq == Seq("user", "shard"))
    assert(out.schema("key").dataType == StringType)
    val row = out.where($"offset" === 1)
      .select($"key", $"key_typed.user", $"key_typed.shard").head()
    assert(row.getString(0).contains(s""""user":"${row.getString(1)}""""))
    assert(row.getString(0).contains(s""""shard":${row.getInt(2)}"""))
    // primitive keys keep the old contract: plain string, no _typed column
    val prim = Transforms.insertKey("key")(records)
    assert(prim.schema("key").dataType == StringType)
    assert(!prim.columns.contains("key_typed"))
  }

  test("schemaless (map-typed) values enrich through the same chain") {
    // the reference's schemaless path: value is a Map, not a Struct
    // (InsertKey.java:80-86, InsertValueAsString.java:92-97)
    val rec = Sources.eventsAsRecords(spark, sf)
      .withColumn("value", map(lit("k1"), col("offset").cast("string")))
    val env = Transforms.enrich("value_json")(rec)
    val row = env.where($"offset" === 3)
      .select($"message.value_json", $"uid").head()
    assert(row.getString(0) == """{"k1":"3"}""")
    assert(row.getString(1) == "events+" +
      env.where($"offset" === 3).select($"partition").head().getInt(0) + "+3")
  }

  test("full chain produces the envelope shape in SMT order") {
    val env = Transforms.enrich("value_json")(records)
    assert(env.schema.fieldNames.toSeq ==
      Seq("message", "timestamp", "topic", "partition", "offset", "key", "uid"))
    val msg = env.schema("message").dataType.asInstanceOf[StructType]
    assert(msg.fieldNames.toSeq == Seq("event_type", "value", "props", "value_json"))
    assert(env.schema("key").dataType == StringType)
  }

  test("uid composes topic+partition+offset (changelog identity)") {
    val env = Transforms.enrich("value_json")(records)
    val row = env.where($"offset" === 7)
      .select($"uid", $"topic", $"partition", $"offset").head()
    assert(row.getString(0) ==
      s"${row.getString(1)}+${row.getInt(2)}+${row.getLong(3)}")
    // uids are unique: the append-only changelog never collides
    assert(env.select($"uid").distinct().count() == env.count())
  }
}
