package graft.ingest

/**
 * Registry-shaped writer-schema resolution — the pluggable seam the
 * reference gets from Confluent's schema-registry client
 * (convert/.../TombstoneAwareAvroConverter.java:16-23 delegates to
 * `AvroConverter`, which resolves each frame's 4-byte schema id against
 * a live registry over REST).
 *
 * The decode expressions consume THIS interface, not a concrete map, so a
 * production deployment drops in a registry-backed implementation (REST
 * fetch + local cache, one instance per executor via the expression's
 * transient-lazy reader cache) without touching the decode path. Fixtures
 * and tests use [[StaticSchemaRegistry]].
 *
 * Implementations MUST be Serializable: resolver instances ride inside
 * Catalyst expressions from the driver into every task. Keep them small —
 * a registry-backed resolver should serialize its ENDPOINT config, not a
 * schema cache (mark caches `@transient lazy`).
 */
trait SchemaResolver extends Serializable {

  /** Writer schema JSON for a wire schema id, if registered. */
  def resolve(id: Int): Option[String]

  /** Ids known to this resolver, for error messages. Best-effort: a
    * remote-registry implementation may return empty rather than listing
    * the world. */
  def knownIds: Seq[Int]

  /** Single-schema convenience mode: when the resolver holds exactly one
    * schema, unknown ids fall back to it (externally produced frames
    * whose ids were never registered locally). Multi-schema resolvers
    * return None and unknown ids stay a loud config error. */
  def soleSchema: Option[String]
}

/** In-memory id→schema resolver: the registry stand-in for fixtures,
  * tests, and deployments that pin their schema set at submit time. */
final case class StaticSchemaRegistry(schemas: Map[Int, String])
    extends SchemaResolver {
  require(schemas.nonEmpty, "StaticSchemaRegistry needs at least one schema")

  override def resolve(id: Int): Option[String] = schemas.get(id)
  override def knownIds: Seq[Int] = schemas.keys.toSeq.sorted
  override def soleSchema: Option[String] =
    if (schemas.size == 1) Some(schemas.head._2) else None
}

/**
 * Confluent Schema Registry REST resolver — the production implementation
 * behind the seam (the reference's converter is registry-backed:
 * convert/.../TombstoneAwareAvroConverter.java:16-18 delegates to
 * `AvroConverter`, whose client resolves each frame's 4-byte id with
 * `GET {baseUrl}/schemas/ids/{id}` returning `{"schema": "<json>"}`).
 *
 * Serialization ships ONLY the endpoint config (per the trait contract);
 * the HTTP client and both caches are `@transient lazy`, built once per
 * executor JVM. [[resolve]] is on the per-ROW decode path
 * (`WireFormatDecode.readerFor` dispatches through it before its reader
 * cache), so results are memoized here:
 *
 *  - positive cache: unbounded — bounded in practice by the registry
 *    size, and registry ids are immutable once assigned;
 *  - negative cache: registration can lag production (a consumer can see
 *    a frame before registry replication catches up), so a miss is NOT
 *    permanent — but PERMISSIVE-mode decode of corrupt frames carries
 *    arbitrary 4-byte ids, and an unbounded negative cache (or none at
 *    all, hammering the registry per row) would not survive a
 *    garbage-flood ingest. Misses are therefore cached and the miss set
 *    is CLEARED whenever it exceeds `maxNegativeCache` — re-resolution
 *    stays possible, memory stays bounded, and registry traffic is
 *    amortized to one call per miss-set generation.
 *
 * Non-2xx/404 responses and transport errors THROW (fail the task, let
 * Spark retry): silently treating a flaky registry as "id unknown" would
 * misroute frames to the single-schema fallback or PERMISSIVE null-out.
 */
final case class HttpSchemaResolver(
    baseUrl: String,
    connectTimeoutMs: Int = 5000,
    requestTimeoutMs: Int = 10000,
    maxNegativeCache: Int = 10000) extends SchemaResolver {
  require(baseUrl.startsWith("http"), s"not an http(s) endpoint: $baseUrl")

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs.toLong))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
  @transient private lazy val hits =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  @transient private lazy val misses =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def resolve(id: Int): Option[String] = {
    val cached = hits.get(id)
    if (cached != null) return Some(cached)
    if (misses.contains(id)) return None
    fetch(id) match {
      case Some(schema) =>
        hits.putIfAbsent(id, schema)
        Some(schema)
      case None =>
        if (misses.size() >= maxNegativeCache) misses.clear()
        misses.add(id)
        None
    }
  }

  private def fetch(id: Int): Option[String] = {
    val base = baseUrl.stripSuffix("/")
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"$base/schemas/ids/$id"))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
      .header("Accept", "application/vnd.schemaregistry.v1+json, application/json")
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 =>
        // {"schema": "<avro schema as a JSON-escaped string>", ...}
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        val schema = node.get("schema")
        if (schema == null || !schema.isTextual)
          throw new IllegalStateException(
            s"schema registry returned 200 for id $id without a " +
              s"textual 'schema' field: ${resp.body().take(200)}")
        Some(schema.asText())
      case 404 => None // Confluent error 40403: schema id not found
      case other => throw new IllegalStateException(
        s"schema registry GET $base/schemas/ids/$id failed: HTTP $other " +
          s"${resp.body().take(200)}")
    }
  }

  /** Ids resolved so far on THIS executor — best-effort per the trait
    * contract (a registry cannot cheaply enumerate the world). */
  override def knownIds: Seq[Int] = {
    import scala.jdk.CollectionConverters._
    hits.keySet().asScala.toSeq.sorted
  }

  override def soleSchema: Option[String] = None
}
