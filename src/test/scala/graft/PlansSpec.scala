package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * The automated plan gate (round-11 verdict item 5): `PlanGuard` sweeps
 * EVERY `SparkEntry.queries` entry — PLANS.md stays the human-readable
 * snapshot, this suite is the tripwire that a future edit cannot dodge.
 * First the tripwire itself is tested against planted regressions (a
 * gate that cannot fail is not a gate), then the full surface must come
 * back clean modulo the adjudicated allowlist below.
 */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("tripwire catches planted regressions (the gate can fail)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey")

    // 1. a genuine CartesianProduct (broadcasting disabled so the tiny
    //    fixture sides can't rescue it into a BNLJ)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val cart = li.crossJoin(ord)
      assert(PlanGuard.violations(cart)
        .exists(_.contains("CartesianProduct")), "cartesian not caught")
    }

    // 2. BNLJ broadcasting an UNBOUNDED table (non-equi join, no
    //    aggregate/limit anywhere on the build side)
    val bnlj = li.join(broadcast(ord), $"l_orderkey" < $"o_orderkey")
    assert(PlanGuard.violations(bnlj)
      .exists(_.contains("unbounded build side")), "unbounded BNLJ not caught")

    // 3. single-partition window over a raw table scan
    val w = org.apache.spark.sql.expressions.Window.orderBy($"l_orderkey")
    val globalWindow = li.withColumn("rn", row_number().over(w))
    assert(PlanGuard.violations(globalWindow)
      .exists(_.contains("single-partition window")),
      "global window not caught")

    // 4. a stats-eligible broadcast join forced to shuffle — planted via
    //    conf (not a hint: hinted joins are deliberately exempt)
    withSQLConf("spark.sql.join.preferSortMergeJoin" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "1048576") {
      val smj = li.repartition($"l_orderkey")
        .join(ord.repartition($"o_orderkey").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
      // the hint exempts it -> no violation...
      assert(!PlanGuard.violations(smj).exists(_.contains("broadcast")))
    }

    // ...and the scalar-attach idiom passes (bounded build side)
    val scalar = li.crossJoin(broadcast(ord.agg(max($"o_custkey").as("m"))))
    assert(PlanGuard.violations(scalar).isEmpty,
      s"scalar attach flagged: ${PlanGuard.violations(scalar)}")

    // 5. unpruned partitioned scan: the topic predicate stranded ABOVE
    //    a window partitioned by a different column cannot push through
    //    to the file index — every partition is read, then filtered
    val dir = java.nio.file.Files
      .createTempDirectory("planguard-prune").toString + "/t"
    li.limit(50).select($"l_orderkey".as("k"),
        ($"l_orderkey" % 3).cast("string").as("topic"), $"l_quantity")
      .write.partitionBy("topic").parquet(dir)
    val part = spark.read.parquet(dir)
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"l_quantity")
    val stranded = part.withColumn("rn", row_number().over(wk))
      .where($"topic" === "1")
    assert(PlanGuard.violations(stranded)
      .exists(_.contains("unpruned partitioned scan")),
      "stranded partition predicate not caught")
    // control 1: the adjacent predicate pushes to the file index
    val prunedScan = part.where($"topic" === "1")
      .withColumn("rn", row_number().over(wk))
    assert(!PlanGuard.violations(prunedScan)
      .exists(_.contains("unpruned")),
      "pruned scan falsely flagged")
    // control 2: a full scan with no partition predicate is deliberate
    val full = part.groupBy($"topic").agg(sum($"l_quantity"))
    assert(!PlanGuard.violations(full).exists(_.contains("unpruned")),
      "full scan falsely flagged")
  }

  test("tripwire catches the duplicated-interpreted-subtree class (the " +
      "pre-fix x139 shape: one HOF-derived column re-planned into both " +
      "sides of a self-join), and a materialized fan-out passes") {
    // a deliberately LONG interpreted chain (array filter + join over a
    // derived split — the canonicalizeUrl shape, > 20 expression nodes)
    val chain = array_join(filter(split(upper(concat($"source",
        lit("?a=1&utm_x=2&b=3&utm_y=4&ref=z&c=5"), $"source", lit("#f"))),
        "&"),
      t => !t.startsWith("UTM_") && !t.startsWith("REF=") && t =!= ""),
      "&")
    val base = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source").withColumn("domain", chain)
    // pre-fix x139: the registry leg derives `domain` from the same
    // un-materialized frame the enforcement leg joins — the optimizer
    // plans the chain into BOTH branches
    val reg = base.select($"domain").distinct()
      .where(length($"domain") % 4 === 0).limit(100)
      .withColumn("opted_out", lit(1L))
    // the aggregate CONSUMES the join output (coalesce over opted_out) —
    // otherwise the optimizer eliminates the cardinality-preserving
    // left join and there is no duplication left to catch
    val joined = base.join(broadcast(reg), Seq("domain"), "left")
      .groupBy($"source")
      .agg(sum(coalesce($"opted_out", lit(0L))).as("n"))
    assert(PlanGuard.violations(joined)
      .exists(_.contains("interpreted higher-order subtree")),
      "duplicated interpreted chain not caught; violations = " +
        PlanGuard.violations(joined).mkString("; ") + "\nPLAN:\n" +
        joined.queryExecution.executedPlan.toString)
    // the FIX pattern: materialize the small derived projection once —
    // both consumers read the checkpointed frame, no chain duplication
    val mat = base.localCheckpoint()
    val reg2 = mat.select($"domain").distinct()
      .where(length($"domain") % 4 === 0).limit(100)
    val fixed = mat.join(broadcast(reg2), Seq("domain"), "left")
      .groupBy($"source").agg(count(lit(1)).as("n"))
    assert(!PlanGuard.violations(fixed)
      .exists(_.contains("interpreted higher-order subtree")),
      "materialized fan-out falsely flagged")
  }

  test("tripwire catches the baked-artifact class (check 7): a plan " +
      "node carrying an oversized driver-held literal matrix is " +
      "flagged; the k×dim sync-sized artifacts pass") {
    val docs = Tables.load(spark, sf, "documents").select($"doc_id")
    // planted: a ~1.6 MiB literal matrix folded into one projection —
    // the pre-fix x140 shape (a corpus-linear centroid matrix baked
    // into the task binary)
    val big = Array.fill(200000)(1.0d).toSeq
    val planted = docs.withColumn("s",
      element_at(typedLit(big), ($"doc_id" % 1000 + 1).cast("int")))
    assert(PlanGuard.violations(planted)
      .exists(_.contains("driver-baked literal payload")),
      "oversized baked literal not caught")
    // control: a centroid-sync-sized artifact (8x64 doubles = 4 KiB)
    // passes
    val small = Array.fill(512)(1.0d).toSeq
    val ok = docs.withColumn("s",
      element_at(typedLit(small), ($"doc_id" % 512 + 1).cast("int")))
    assert(!PlanGuard.violations(ok)
      .exists(_.contains("driver-baked")),
      "sync-sized artifact falsely flagged")
    // control: the same big artifact as a BROADCAST side built from
    // DATA (the fix pattern — a broadcast relation ships once per
    // executor, and rows are payload, not plan-node literals)
    val lut = Seq(Tuple1(big)).toDF("lut")
    val fixed = docs.crossJoin(broadcast(lut))
      .select($"doc_id",
        element_at($"lut", ($"doc_id" % 1000 + 1).cast("int")).as("s"))
      .agg(sum($"s"))
    assert(!PlanGuard.violations(fixed)
      .exists(_.contains("driver-baked")),
      "broadcast LUT falsely flagged: " +
        PlanGuard.violations(fixed).mkString("; "))
  }

  /** Adjudicated exceptions: entry -> substrings of violations that are
    * deliberate. Keep justifications here, next to the waiver. */
  private val allow: Map[String, Seq[String]] = Map(
  )

  test("every SparkEntry entry plans clean: no CartesianProduct, no " +
      "unbounded broadcast, no single-partition window over raw input, " +
      "no missed stats-eligible broadcast") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val vs =
          try PlanGuard.violations(build(spark, sf))
          catch { case e: Throwable =>
            Seq(s"entry failed to build/plan: ${e.getClass.getSimpleName}: " +
              s"${String.valueOf(e.getMessage).take(200)}")
          }
        vs.filterNot(v => allow.getOrElse(name, Nil).exists(v.contains))
          .map(v => s"$name: $v")
    }
    assert(failures.isEmpty,
      s"\n${failures.size} plan violations:\n${failures.mkString("\n")}")
  }
}
