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
