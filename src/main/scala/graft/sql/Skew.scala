package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling join utilities for the 100 TB posture.
 *
 * AQE's skew-join handles sort-merge skew automatically by splitting
 * oversized partitions at runtime, and small dims should simply be
 * `broadcast()`. Explicit SALTING is for the remaining case: a shuffled
 * equi-join (or aggregation feed) on a low-cardinality/hot key where one
 * key's rows would land on a single task — e.g. joining an event stream
 * against per-event-type reference data when the dim is too wide to
 * broadcast. The fact side gets a uniform salt derived from a high-
 * cardinality column; the dim side is replicated once per salt value; the
 * join key becomes (key, salt), so the hot key's rows spread across
 * `salts` tasks instead of one.
 */
object Skew {

  /**
   * Inner equi-join of a skewed fact against a per-key dim, salted
   * `salts` ways. `factId` must be high-cardinality (row id, offset) so
   * the salt is uniform within each hot key. Result is identical to
   * `fact.join(dim, key)` — only the physical partitioning changes: the
   * exchange hashes on (key, _salt), bounding any task's share of a hot
   * key to ~1/salts of its rows.
   */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      factId: Column, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(factId), lit(salts)).cast("int"))
    val dimRep = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedFact.join(dimRep, Seq(key, "_salt")).drop("_salt")
  }
}
