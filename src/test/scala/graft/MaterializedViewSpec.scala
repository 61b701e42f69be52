package graft

import graft.plans.MaterializedViews
import org.apache.spark.sql.functions._

/** MV substitution: rollup queries over the source are rewritten to
  * aggregate the cached MV; non-rollup-able queries are untouched;
  * results are identical either way. */
class MaterializedViewSpec extends SparkSpec {

  private def source = T(spark, sfDir, "orders")

  test("rollup over a subset of MV keys scans the cached MV, not the source") {
    MaterializedViews.register(spark, "mv_orders", source,
      keys = Seq("o_orderstatus", "o_orderpriority"),
      sums = Seq("o_totalprice"), maxs = Seq("o_orderdate"))
    try {
      val q = source.groupBy("o_orderstatus")
        .agg(sum("o_totalprice").as("t"), count(lit(1)).as("n"),
          max("o_orderdate").as("last"))
        .orderBy("o_orderstatus")

      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"), s"expected MV scan:\n$plan")
      // the file-source relation must be gone from the logical plan (the
      // cached-plan dump inside InMemoryRelation still mentions parquet)
      val fileScans = plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(fileScans.isEmpty, s"source must not be rescanned:\n$plan")

      // identical values with the rule disabled
      val expected = {
        MaterializedViews.clear()
        val e = source.groupBy("o_orderstatus")
          .agg(sum("o_totalprice").as("t"), count(lit(1)).as("n"),
            max("o_orderdate").as("last"))
          .orderBy("o_orderstatus").collect()
        e
      }
      // re-register for the rewritten run
      MaterializedViews.register(spark, "mv_orders", source,
        keys = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("o_totalprice"), maxs = Seq("o_orderdate"))
      val got = q.collect()
      assert(got.length == expected.length)
      // double SUM rollup re-associates the accumulation, so the sums
      // agree to ulp-level tolerance; the exact columns agree exactly
      got.zip(expected).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0))
        assert(math.abs(g.getDouble(1) - e.getDouble(1)) <= 1e-9 * math.abs(e.getDouble(1)))
        assert(g.getLong(2) == e.getLong(2))
        assert(g.get(3) == e.get(3))
      }
    } finally MaterializedViews.clear()
  }

  test("queries the MV cannot answer are left untouched") {
    MaterializedViews.register(spark, "mv_orders2", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      // group key not covered by the MV
      val q1 = source.groupBy("o_custkey").agg(sum("o_totalprice").as("t"))
      assert(!q1.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
      // aggregate not covered (min of a non-declared column)
      val q2 = source.groupBy("o_orderstatus").agg(min("o_totalprice").as("m"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
      // distinct aggregation is never rolled up from partials
      val q3 = source.groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("d"))
      assert(!q3.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
    } finally MaterializedViews.clear()
  }

  test("key-only filters commute through the rollup and substitute") {
    MaterializedViews.register(spark, "mv_orders4", source,
      keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"))
    try {
      val q = source.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderstatus").agg(sum("o_totalprice").as("t"))
        .orderBy("o_orderstatus")
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"),
        s"key-only filter should not block substitution:\n$plan")

      // a filter on a NON-key column must block substitution
      val q2 = source.filter(col("o_custkey") > 100)
        .groupBy("o_orderstatus").agg(sum("o_totalprice").as("t"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))

      // value parity
      val expected = {
        MaterializedViews.clear()
        source.filter(col("o_orderpriority") === "1-URGENT")
          .groupBy("o_orderstatus").agg(sum("o_totalprice").as("t"))
          .orderBy("o_orderstatus")
          .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      }
      MaterializedViews.register(spark, "mv_orders4", source,
        keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"))
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - expected(k)) <= 1e-9 * math.abs(expected(k)))
      }
    } finally MaterializedViews.clear()
  }

  test("COUNT(col) rolls up from the per-column non-null partial counts") {
    MaterializedViews.register(spark, "mv_cntn", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      val q = source.groupBy("o_orderstatus")
        .agg(count(col("o_totalprice")).as("nn"))
        .orderBy("o_orderstatus")
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "COUNT(col) must substitute via the cntn partial")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = {
        MaterializedViews.clear()
        source.groupBy("o_orderstatus")
          .agg(count(col("o_totalprice")).as("nn"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      }
      assert(got == expected)
    } finally MaterializedViews.clear()
  }

  test("key-column aggregates roll up directly: COUNT(DISTINCT key), MIN/MAX(key)") {
    MaterializedViews.register(spark, "mv_keyagg", source,
      keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"))
    try {
      val q = source.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderpriority")).as("dp"),
          min("o_orderpriority").as("lo"), max("o_orderpriority").as("hi"))
        .orderBy("o_orderstatus")
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        s"key-column aggregates must substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect().map(r =>
        (r.getString(0), (r.getLong(1), r.getString(2), r.getString(3)))).toMap
      val expected = {
        MaterializedViews.clear()
        source.groupBy("o_orderstatus")
          .agg(countDistinct(col("o_orderpriority")).as("dp"),
            min("o_orderpriority").as("lo"), max("o_orderpriority").as("hi"))
          .collect().map(r =>
            (r.getString(0), (r.getLong(1), r.getString(2), r.getString(3)))).toMap
      }
      assert(got == expected)
    } finally MaterializedViews.clear()
  }

  test("AVG rolls up as sum-of-sums over sum-of-counts") {
    MaterializedViews.register(spark, "mv_avg", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      val q = source.groupBy("o_orderstatus").agg(avg("o_totalprice").as("a"))
        .orderBy("o_orderstatus")
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "AVG must substitute")
      val expected = {
        MaterializedViews.clear()
        source.groupBy("o_orderstatus").agg(avg("o_totalprice").as("a"))
          .orderBy("o_orderstatus").collect()
          .map(r => (r.getString(0), r.getDouble(1))).toMap
      }
      MaterializedViews.register(spark, "mv_avg", source,
        keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
      q.collect().foreach { r =>
        val e = expected(r.getString(0))
        assert(math.abs(r.getDouble(1) - e) <= 1e-9 * math.abs(e))
      }
    } finally MaterializedViews.clear()
  }

  test("join MV substitutes an aggregate over the same join, tolerant of pruning/hints/order") {
    val li = T(spark, sfDir, "lineitem")
    val part = T(spark, sfDir, "part")
    val joined = li.join(part, col("l_partkey") === col("p_partkey"))
    MaterializedViews.register(spark, "mv_join", joined,
      keys = Seq("p_brand", "l_returnflag"), sums = Seq("l_quantity"))
    try {
      // different join order + broadcast hint + pruned columns: same shape
      val q = part.join(broadcast(li), col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .orderBy("p_brand")
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"), s"expected MV scan:\n$plan")
      assert(plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"join must not be re-executed:\n$plan")

      val expected = {
        MaterializedViews.clear()
        part.join(li, col("p_partkey") === col("l_partkey"))
          .groupBy("p_brand").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
          .orderBy("p_brand").collect()
          .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
      }
      MaterializedViews.register(spark, "mv_join", joined,
        keys = Seq("p_brand", "l_returnflag"), sums = Seq("l_quantity"))
      val got = q.collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, (s1, n)) =>
        assert(math.abs(s1 - expected(k)._1) <= 1e-9 * math.abs(expected(k)._1))
        assert(n == expected(k)._2)
      }

      // an aggregate over the BARE fact must NOT match the join MV
      // (fewer leaves), nor one joining on a different key pair
      val q2 = li.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
      val q3 = li.join(part, col("l_suppkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      assert(!q3.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
    } finally MaterializedViews.clear()
  }

  test("grand-total rollup (empty grouping) also substitutes") {
    MaterializedViews.register(spark, "mv_orders3", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      val q = source.agg(sum("o_totalprice").as("t"))
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
      val direct = {
        MaterializedViews.clear()
        source.agg(sum("o_totalprice").as("t")).collect()(0).getDouble(0)
      }
      MaterializedViews.register(spark, "mv_orders3", source,
        keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
      val got = q.collect()(0).getDouble(0)
      assert(math.abs(got - direct) < 1e-6 * math.abs(direct))
    } finally MaterializedViews.clear()
  }

  private def hasMv(q: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = q.queryExecution.optimizedPlan
    plan.toString.contains("InMemoryRelation") &&
      plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty
  }

  test("filtered MV: an implying query predicate substitutes with a compensating filter") {
    // MV materializes only 1997+ orders; o_orderdate is a key, so
    // narrower predicates can re-apply on the rollup.
    val src = source.filter(col("o_orderdate") >= "1997-01-01")
    def reg() = MaterializedViews.register(spark, "mv_filt", src,
      keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
    reg()
    try {
      // >= 1998 implies >= 1997: substitutes, compensation on the key
      val q = source.filter(col("o_orderdate") >= "1998-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(hasMv(q), s"subsumed range must substitute:\n${q.queryExecution.optimizedPlan}")
      // = a date inside the MV range also implies it
      val qe = source.filter(col("o_orderdate") === "1998-06-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(hasMv(qe), "point predicate inside the MV range must substitute")
      // exact same predicate: absorbed, no compensation needed
      val qx = source.filter(col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(hasMv(qx), "exactly-matching predicate must substitute")

      // value parity for the compensated rollup (counts are exact)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = {
        MaterializedViews.clear()
        source.filter(col("o_orderdate") >= "1998-01-01")
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      }
      assert(got == expected, s"compensated rollup diverged: $got vs $expected")
    } finally MaterializedViews.clear()
  }

  test("filtered MV: non-implying predicates do NOT substitute") {
    val src = source.filter(col("o_orderdate") >= "1997-01-01")
    MaterializedViews.register(spark, "mv_filt2", src,
      keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
    try {
      // wider range: the MV is missing 1996 rows
      val q1 = source.filter(col("o_orderdate") >= "1996-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q1), "wider predicate must not substitute")
      // no filter at all
      val q2 = source.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q2), "unfiltered query must not read a filtered MV")
      // filter on an unrelated column only
      val q3 = source.filter(col("o_orderstatus") === "F")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q3), "predicate not implying the MV's must not substitute")
      // opposite direction on the same column
      val q4 = source.filter(col("o_orderdate") <= "1998-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q4), "reverse range must not substitute")
    } finally MaterializedViews.clear()
  }

  test("filtered MV on a NON-key column: exact match absorbs, strict implication blocks") {
    val src = source.filter(col("o_totalprice") > 1000)
    MaterializedViews.register(spark, "mv_filt3", src,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      // identical predicate: fully absorbed by the MV, no compensation
      val q = source.filter(col("o_totalprice") > 1000)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(hasMv(q),
        s"exact non-key predicate must absorb:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = {
        MaterializedViews.clear()
        source.filter(col("o_totalprice") > 1000)
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      }
      assert(got == expected)
      // strictly narrower on the non-key column: implies the MV's range
      // but cannot compensate (o_totalprice is not in the rollup output)
      MaterializedViews.register(spark, "mv_filt3", src,
        keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
      val q2 = source.filter(col("o_totalprice") > 2000)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q2), "non-key compensation must block substitution")
    } finally MaterializedViews.clear()
  }

  test("filtered MV: a WIDER query range unions the MV with a residual-slice scan") {
    val src = source.filter(col("o_orderdate") >= "1998-01-01")
    MaterializedViews.register(spark, "mv_union", src,
      keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
    try {
      // 1997+ strictly contains the MV's 1998+ slice: covered part from
      // the cache, residual [1997, 1998) from ONE filtered fact scan
      val q = source.filter(col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"),
        s"union compensation must reuse the cached partials:\n$plan")
      assert(plan.collect { case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }.nonEmpty,
        s"expected the partial-coverage union:\n$plan")
      val scans = plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 1, s"residual slice must scan the fact exactly once:\n$plan")
      // the residual filter bounds BOTH sides (q ∧ ¬m)
      val planStr = plan.toString
      assert(planStr.contains("< 1998-01-01") && planStr.contains(">= 1997-01-01"),
        s"residual must be the complement slice:\n$plan")

      // value parity (counts are exact)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = {
        MaterializedViews.clear()
        source.filter(col("o_orderdate") >= "1997-01-01")
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      }
      assert(got == expected, s"union-compensated rollup diverged: $got vs $expected")

      // a wider range on a DIFFERENT column must not union-rewrite
      MaterializedViews.register(spark, "mv_union", src,
        keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
      val q2 = source.filter(col("o_totalprice") > 0)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q2), "unrelated predicate must not rewrite")
    } finally MaterializedViews.clear()
  }

  test("derived measures: SUM/AVG/COUNT of a registered expression roll up from the tile") {
    val li = T(spark, sfDir, "lineitem")
    def revenue = T.dec2(col("l_extendedprice")) *
      (lit(1).cast(org.apache.spark.sql.types.DecimalType(12, 2)) - T.dec2(col("l_discount")))
    MaterializedViews.register(spark, "mv_rev", li,
      keys = Seq("l_returnflag", "l_linestatus"), sums = Nil,
      sumExprs = Seq("revenue" -> revenue))
    try {
      val q = li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(revenue).as("rev"), avg(revenue).as("arev"),
          count(revenue).as("crev"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
      assert(hasMv(q),
        s"registered measure expression must substitute:\n${q.queryExecution.optimizedPlan}")
      // a DIFFERENT expression must not match the measure
      val q2 = li.groupBy("l_returnflag")
        .agg(sum(T.dec2(col("l_extendedprice")) * T.dec2(col("l_discount"))).as("x"))
      assert(!hasMv(q2), "an unregistered expression must not substitute")

      val got = q.collect().map(r => (r.getString(0) + r.getString(1),
        (r.getDecimal(2), r.getDecimal(3), r.getLong(4), r.getLong(5)))).toMap
      val expected = {
        MaterializedViews.clear()
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(revenue).as("rev"), avg(revenue).as("arev"),
            count(revenue).as("crev"), count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0) + r.getString(1),
            (r.getDecimal(2), r.getDecimal(3), r.getLong(4), r.getLong(5)))).toMap
      }
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, (rev, arev, crev, n)) =>
        val (erev, earev, ecrev, en) = expected(k)
        assert(rev.compareTo(erev) == 0, s"$k: decimal sum diverged $rev vs $erev")
        assert(crev == ecrev && n == en, s"$k: counts diverged")
        assert(math.abs(arev.doubleValue - earev.doubleValue) <=
          1e-9 * math.abs(earev.doubleValue))
      }
    } finally MaterializedViews.clear()
  }

  test("key-derived grouping expressions roll up: GROUP BY year(key) from a day-keyed tile") {
    MaterializedViews.register(spark, "mv_time", source,
      keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
    try {
      val q = source.groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("t"))
        .orderBy("yr")
      assert(hasMv(q),
        s"year(key) grouping must substitute:\n${q.queryExecution.optimizedPlan}")
      // mixed expression of two keys also rolls up
      val q2 = source.groupBy(
          concat(col("o_orderstatus"), lit("-"), year(col("o_orderdate"))).as("g"))
        .agg(count(lit(1)).as("n"))
      assert(hasMv(q2), "expression over multiple keys must substitute")
      // an expression referencing a NON-key column must block
      val q3 = source.groupBy((col("o_custkey") % 10).as("b"))
        .agg(count(lit(1)).as("n"))
      assert(!hasMv(q3), "non-key expression grouping must not substitute")
      // a non-deterministic grouping must block
      val q4 = source.groupBy((rand() * 0).as("r"))
        .agg(count(lit(1)).as("n"))
      assert(!hasMv(q4), "non-deterministic grouping must not substitute")

      val got = q.collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
      val expected = {
        MaterializedViews.clear()
        source.groupBy(year(col("o_orderdate")).as("yr"))
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("t"))
          .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
      }
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, (n, t)) =>
        assert(n == expected(k)._1, s"$k count diverged")
        assert(math.abs(t - expected(k)._2) <= 1e-9 * math.abs(expected(k)._2))
      }
    } finally MaterializedViews.clear()
  }

  test("multi-conjunct union compensation: shared equality + one widened range") {
    // MV covers 1-URGENT orders from 1998; query asks 1-URGENT from 1997
    // — the shared equality rides along, the residual is the pure
    // conjunction (priority ∧ 1997 ≤ date < 1998) and pushes to the scan
    val src = source.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_orderdate") >= "1998-01-01")
    MaterializedViews.register(spark, "mv_mcu", src,
      keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
    try {
      val q = source.filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"),
        s"covered slice must come from the cache:\n$plan")
      val scans = plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 1, s"residual must scan the fact exactly once:\n$plan")
      val planStr = plan.toString
      assert(planStr.contains("< 1998-01-01") && planStr.contains(">= 1997-01-01")
        && planStr.contains("1-URGENT"),
        s"residual must carry the shared conjunct AND the range complement:\n$plan")

      // value parity
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = {
        MaterializedViews.clear()
        source.filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= "1997-01-01")
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      }
      assert(got == expected, s"multi-conjunct union diverged: $got vs $expected")

      // negatives: a query missing the shared equality would need a
      // disjunctive residual — blocked; so would two widened ranges
      MaterializedViews.register(spark, "mv_mcu", src,
        keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
      val q2 = source.filter(col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q2), "query without the shared conjunct must not rewrite")
      val q3 = source.filter(col("o_orderpriority") =!= "X" &&
          col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!hasMv(q3), "a non-matching second conjunct must not rewrite")
    } finally MaterializedViews.clear()
  }

  test("filtered MV: incremental refresh keeps only delta rows the MV predicate admits") {
    val src = source.filter(col("o_orderdate") >= "1997-01-01")
    MaterializedViews.register(spark, "mv_filt4", src,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      // delta straddles the predicate: only 1997+ rows may fold in
      val delta = source.limit(0).unionByName(
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row(900001L, 1L, "O", 10.0,
              java.sql.Timestamp.valueOf("1996-06-01 00:00:00"), "1-URGENT"),
            org.apache.spark.sql.Row(900002L, 1L, "O", 20.0,
              java.sql.Timestamp.valueOf("1998-06-01 00:00:00"), "1-URGENT"))),
          source.schema))
      val before = src.count()
      MaterializedViews.refreshIncremental(spark, "mv_filt4", delta)
      val q = source.filter(col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(hasMv(q), "refreshed filtered MV must still substitute")
      val total = q.collect().map(_.getLong(1)).sum
      assert(total == before + 1, s"only the in-range delta row may fold in: $total vs ${before + 1}")
    } finally MaterializedViews.clear()
  }

  test("incremental refresh folds a delta in without rescanning; rewrite still fires") {
    // simulate an append-only source: register over the first half,
    // refresh with the second half, compare against the full aggregate
    val half1 = source.filter(col("o_orderkey") % 2 === 0)
    val half2 = source.filter(col("o_orderkey") % 2 === 1)
    // the MV's defining source must be a file scan, so register over the
    // full table but rebuild its content from half1 by refreshing from
    // an empty registration is not expressible — instead register on the
    // full source, then append a NEW batch (reusing half2 rows as the
    // delta) and check the merge algebra against a direct recompute.
    MaterializedViews.register(spark, "mv_inc", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"),
      mins = Seq("o_orderdate"), maxs = Seq("o_orderdate"))
    try {
      val refreshed = MaterializedViews.refreshIncremental(spark, "mv_inc", half2)
      val expect = source.unionByName(half2).groupBy("o_orderstatus")
        .agg(sum("o_totalprice").as("t"), count(lit(1)).as("n"),
          min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
        .collect().map(r => r.getString(0) -> r).toMap
      val gotRows = refreshed.collect()
      assert(gotRows.length == expect.size)
      gotRows.foreach { r =>
        val e = expect(r.getString(0))
        val sumIx = refreshed.columns.indexOf("__mv_sum_o_totalprice")
        val cntIx = refreshed.columns.indexOf("__mv_cnt")
        assert(math.abs(r.getDouble(sumIx) - e.getDouble(1)) <= 1e-9 * math.abs(e.getDouble(1)))
        assert(r.getLong(cntIx) == e.getLong(2))
        assert(r.get(refreshed.columns.indexOf("__mv_min_o_orderdate")) == e.get(3))
        assert(r.get(refreshed.columns.indexOf("__mv_max_o_orderdate")) == e.get(4))
      }
      // the rewrite rule still answers rollups from the refreshed MV
      val q = source.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "rewrite must target the refreshed generation")
    } finally MaterializedViews.clear()
  }

  test("join compensation: a query joining the MV star to one extra dimension substitutes") {
    val orders = source
    val customer = T(spark, sfDir, "customer")
    val nation = T(spark, sfDir, "nation")
    val star = orders.join(customer, col("o_custkey") === col("c_custkey"))
    MaterializedViews.register(spark, "mv_jc", star,
      keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
    try {
      val q = star.join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"),
          max("n_regionkey").as("rk"))
        .orderBy("n_name")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"star must come from the cached MV:\n$lp")
      val scans = lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 1, s"only the dimension may be scanned:\n$lp")

      // value parity against the direct 3-way join
      val expected = {
        MaterializedViews.clear()
        star.join(nation, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"),
            max("n_regionkey").as("rk"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
      }
      MaterializedViews.register(spark, "mv_jc", star,
        keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
      val got = q.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, (n, rev, rk)) =>
        val (en, erev, erk) = expected(k)
        assert(n == en && rk == erk, s"$k: exact columns diverged")
        assert(math.abs(rev - erev) <= 1e-9 * math.abs(erev), s"$k: sum diverged")
      }

      // filter on a dim column stays above the compensated join
      val qf = star.join(nation, col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 1L)
        .groupBy("n_name").agg(count(lit(1)).as("n"))
      assert(hasMvWithScans(qf, 1), "dim filter must not block compensation")
      val gotF = qf.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expF = {
        MaterializedViews.clear()
        val e = star.join(nation, col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") === 1L)
          .groupBy("n_name").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        MaterializedViews.register(spark, "mv_jc", star,
          keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
        e
      }
      assert(gotF == expF, s"dim-filtered compensation diverged: $gotF vs $expF")
    } finally MaterializedViews.clear()
  }

  test("join compensation: multi-dim snowflake + weighted dim aggregates") {
    val orders = source
    val customer = T(spark, sfDir, "customer")
    val nation = T(spark, sfDir, "nation")
    val region = T(spark, sfDir, "region")
    val star = orders.join(customer, col("o_custkey") === col("c_custkey"))
    MaterializedViews.register(spark, "mv_snow", star,
      keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
    try {
      // TWO extra dims; region joins on NATION's column (snowflake
      // bridge), and the aggregates include multiplicity-sensitive
      // SUM/COUNT/AVG over DIM columns — re-weighted by __mv_cnt
      def q = star
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n"), sum("n_regionkey").as("sreg"),
          count(col("n_name")).as("cn"), avg("n_nationkey").as("an"))
        .orderBy("r_name")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"snowflake star must come from the cached MV:\n$lp")
      val scans = lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 2, s"only nation + region may be scanned:\n$lp")

      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      val expected = {
        MaterializedViews.clear()
        q.collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      }
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, (n, sreg, cn, an)) =>
        val (en, esreg, ecn, ean) = expected(k)
        assert(n == en && sreg == esreg && cn == ecn, s"$k: exact columns diverged")
        assert(math.abs(an - ean) <= 1e-9 * math.abs(ean), s"$k: avg diverged")
      }
    } finally MaterializedViews.clear()
  }

  test("join compensation negatives: non-key join and non-key star filter stay blocked") {
    val orders = source
    val customer = T(spark, sfDir, "customer")
    val nation = T(spark, sfDir, "nation")
    val star = orders.join(customer, col("o_custkey") === col("c_custkey"))
    MaterializedViews.register(spark, "mv_jcn", star,
      keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
    try {
      // join on a star column the MV does NOT carry as a key
      val q1 = star.join(nation, col("o_custkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
      assert(!hasMv(q1), "non-key join column must block compensation")
      // a function the rollup cannot re-weight over a dim column
      val q2 = star.join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("o_orderstatus").agg(stddev("n_regionkey").as("s"))
      assert(!hasMv(q2), "non-rollupable dim aggregate must block")
      // filter on a star NON-key column cannot compensate
      val q3 = star.filter(col("o_totalprice") > 1000)
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
      assert(!hasMv(q3), "non-key star filter must block")
    } finally MaterializedViews.clear()
  }

  private def hasMvWithScans(q: org.apache.spark.sql.DataFrame, nScans: Int): Boolean = {
    val plan = q.queryExecution.optimizedPlan
    plan.toString.contains("InMemoryRelation") &&
      plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.size == nScans
  }

  test("DML invalidation: a post-UPDATE rollup reads the rewritten table, not a stale cache") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvdml").toString + "/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "tag", "amt").write.parquet(dir)
    val other = java.nio.file.Files.createTempDirectory("mvdml").toString + "/u"
    Seq((9L, "z", 1.0)).toDF("id", "tag", "amt").write.parquet(other)
    try {
      def src = spark.read.parquet(dir)
      MaterializedViews.register(spark, "mv_dml", src,
        keys = Seq("tag"), sums = Seq("amt"))
      def rollup = spark.read.parquet(dir).groupBy("tag").agg(sum("amt").as("t"))
      assert(hasMv(rollup), "MV must answer the rollup before any DML")

      // no-false-invalidation: DML on an UNRELATED path keeps the MV
      graft.plans.TableDml.update(spark, other, col("id") === 9L,
        Map("amt" -> lit(2.0)))
      assert(hasMv(rollup), "DML on an unrelated path must not invalidate")

      // UPDATE on the MV's source: the registry drops the MV before the
      // write returns, and the rollup reads post-DML values
      graft.plans.TableDml.update(spark, dir, col("tag") === "a",
        Map("amt" -> (col("amt") + 100.0)))
      val q = rollup
      assert(!hasMv(q), "stale MV must be dropped by the write barrier")
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == Map("a" -> 240.0, "b" -> 20.0), s"post-DML values required: $got")

      // DELETE and MERGE also invalidate a freshly re-registered MV
      MaterializedViews.register(spark, "mv_dml", spark.read.parquet(dir),
        keys = Seq("tag"), sums = Seq("amt"))
      assert(hasMv(rollup))
      graft.plans.TableDml.delete(spark, dir, col("id") === 2L)
      assert(!hasMv(rollup), "DELETE must invalidate")
      MaterializedViews.register(spark, "mv_dml", spark.read.parquet(dir),
        keys = Seq("tag"), sums = Seq("amt"))
      // an APPEND is the one foldable write: the single-leaf MV absorbs
      // the delta algebraically and keeps answering — with fresh values
      graft.plans.TableDml.insertInto(spark, dir,
        Seq((4L, "c", 5.0)).toDF("id", "tag", "amt"))
      assert(MaterializedViews.isRegistered("mv_dml"),
        "append must FOLD into a single-leaf MV, not drop it")
      val q2 = rollup
      assert(hasMv(q2), "folded MV must still substitute")
      val after = q2.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(after == Map("a" -> 240.0, "c" -> 5.0), s"got $after")

      // r13: a JOIN MV with DISTINCT key names FOLDS a one-sided append —
      // the star delta is the appended rows joined against the unchanged
      // dim files (Δ(A⋈B) = ΔA⋈B)
      val dim = java.nio.file.Files.createTempDirectory("mvdml").toString + "/d"
      Seq((1L, 7.0), (5L, 9.0), (6L, 11.0)).toDF("did", "w").write.parquet(dim)
      val joined2 = spark.read.parquet(dir)
        .join(spark.read.parquet(dim), col("id") === col("did"))
      MaterializedViews.register(spark, "mv_dml_join2", joined2,
        keys = Seq("tag"), sums = Seq("w"))
      val preJoin = joined2.groupBy("tag").agg(sum("w").as("sw"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      graft.plans.TableDml.insertInto(spark, dir,
        Seq((5L, "d", 1.0)).toDF("id", "tag", "amt"))
      // join-tile folds run on the maintenance thread (r14); the write
      // barrier itself returns without the fact pass
      MaterializedViews.awaitMaintenance()
      assert(MaterializedViews.isRegistered("mv_dml_join2"),
        "join MV must FOLD a one-sided append (star delta)")
      assert(MaterializedViews.isRegistered("mv_dml"),
        "the single-leaf MV folds the same append")
      val qj = spark.read.parquet(dir)
        .join(spark.read.parquet(dim), col("id") === col("did"))
        .groupBy("tag").agg(sum("w").as("sw"))
      assert(hasMv(qj), "folded join MV must still substitute")
      val afterJoin = qj.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(afterJoin == preJoin + ("d" -> 9.0), s"got $afterJoin vs pre $preJoin")

      // a USING-style join (both key columns named `id`) has an
      // ambiguous delta recipe: the fold refuses and it DROPS — the
      // barrier's no-stale guarantee, never wrong results
      val other2 = java.nio.file.Files.createTempDirectory("mvdml").toString + "/v"
      Seq((1L, 7.0)).toDF("id", "w").write.parquet(other2)
      val joined = spark.read.parquet(dir)
        .join(spark.read.parquet(other2), "id")
      MaterializedViews.register(spark, "mv_dml_join", joined,
        keys = Seq("tag"), sums = Seq("w"))
      graft.plans.TableDml.insertInto(spark, dir,
        Seq((6L, "e", 1.0)).toDF("id", "tag", "amt"))
      assert(!MaterializedViews.isRegistered("mv_dml_join"),
        "same-named join keys cannot rebuild a delta recipe: must drop")
    } finally MaterializedViews.clear()
  }

  test("APPROX_COUNT_DISTINCT rolls up from HLL sketch partials; exact COUNT(DISTINCT) stays blocked") {
    MaterializedViews.register(spark, "mv_hll", source,
      keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"),
      approxDistincts = Seq("o_custkey"))
    try {
      val q = source.groupBy("o_orderstatus")
        .agg(approx_count_distinct("o_custkey").as("ad"))
        .orderBy("o_orderstatus")
      assert(hasMv(q),
        s"approx distinct must substitute via the sketch partial:\n${q.queryExecution.optimizedPlan}")
      // q18-style error gate: the sketch estimate must sit within 5% of
      // the exact distinct count per group
      val exact = {
        val e = source.groupBy("o_orderstatus")
          .agg(countDistinct("o_custkey").as("d"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        e
      }
      q.collect().foreach { r =>
        val (s, est) = (r.getString(0), r.getLong(1))
        val ex = exact(s)
        assert(math.abs(est - ex).toDouble / ex <= 0.05,
          s"sketch estimate for $s off by >5%: $est vs exact $ex")
      }
      // the exact twin: COUNT(DISTINCT non-key) must NOT be answered
      // from a sketch — no contamination of exact paths
      val qx = source.groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("d"))
      assert(!hasMv(qx), "exact distinct on a non-key must not substitute")
      // refreshIncremental merges sketches by union: estimates stay
      // within the gate after folding a delta in
      val delta = source.limit(500)
      MaterializedViews.refreshIncremental(spark, "mv_hll", delta)
      val q2 = source.groupBy("o_orderstatus")
        .agg(approx_count_distinct("o_custkey").as("ad"))
      assert(hasMv(q2), "refreshed MV must still answer the approx rollup")
      q2.collect().foreach { r =>
        // the delta re-adds existing customers: distinct set unchanged
        val ex = exact(r.getString(0))
        assert(math.abs(r.getLong(1) - ex).toDouble / ex <= 0.05)
      }
    } finally MaterializedViews.clear()
  }

  test("folded appends stay union-safe: the residual scan sees the appended files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvus").toString + "/t"
    (1 to 100).map(i => ("g" + (i % 3), i.toDouble, i.toLong))
      .toDF("g", "v", "k").write.parquet(dir)
    try {
      // MV covers the k >= 50 slice
      val src = spark.read.parquet(dir).filter(col("k") >= 50L)
      MaterializedViews.register(spark, "mv_us", src,
        keys = Seq("g", "k"), sums = Seq("v"))
      // append rows OUTSIDE the MV slice (k in [40, 50)): the fold keeps
      // the MV live and refreshes the base file index
      graft.plans.TableDml.insertInto(spark, dir,
        Seq(("g0", 1000.0, 45L), ("g1", 2000.0, 46L)).toDF("g", "v", "k"))
      assert(MaterializedViews.isRegistered("mv_us"), "append must fold, not drop")
      // wider query (k >= 40) union-compensates; its residual FILE scan
      // must include the just-appended rows
      val q = spark.read.parquet(dir).filter(col("k") >= 40L)
        .groupBy("g").agg(sum("v").as("t"))
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"),
        s"wider range must still union-compensate after a folded append:\n$plan")
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val expected = {
        MaterializedViews.clear()
        spark.read.parquet(dir).filter(col("k") >= 40L)
          .groupBy("g").agg(sum("v").as("t"))
          .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      }
      assert(got == expected,
        s"residual scan missed appended rows: $got vs $expected")

      // an MV fed a NON-file delta must refuse union compensation (its
      // residual file scan could not see those rows) while compensation
      // from the cache alone still works
      MaterializedViews.register(spark, "mv_us", spark.read.parquet(dir)
        .filter(col("k") >= 50L), keys = Seq("g", "k"), sums = Seq("v"))
      MaterializedViews.refreshIncremental(spark, "mv_us",
        Seq(("g2", 7.0, 60L)).toDF("g", "v", "k"))
      val qWide = spark.read.parquet(dir).filter(col("k") >= 40L)
        .groupBy("g").agg(sum("v").as("t"))
      assert(!hasMv(qWide), "non-file delta must disable union compensation")
      val qNarrow = spark.read.parquet(dir).filter(col("k") >= 60L)
        .groupBy("g").agg(count(lit(1)).as("n"))
      assert(hasMv(qNarrow), "cache-only compensation stays available")
    } finally MaterializedViews.clear()
  }

  test("APPROX_COUNT_DISTINCT with a tighter-than-sketch rsd is NOT substituted") {
    MaterializedViews.register(spark, "mv_rsd", source,
      keys = Seq("o_orderstatus"), sums = Nil,
      approxDistincts = Seq("o_custkey"))
    try {
      val loose = source.groupBy("o_orderstatus")
        .agg(approx_count_distinct("o_custkey", 0.05).as("ad"))
      assert(hasMv(loose), "default-tolerance approx must substitute")
      val tight = source.groupBy("o_orderstatus")
        .agg(approx_count_distinct("o_custkey", 0.005).as("ad"))
      assert(!hasMv(tight),
        "a 0.5% rsd request must run unrewritten (sketch error ~1.6%)")
    } finally MaterializedViews.clear()
  }

  test("appendIncremental: per-batch cost is one delta aggregate; compaction folds generations") {
    import spark.implicits._
    MaterializedViews.register(spark, "mv_gen", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      val base = source.count()
      def rollupN = source.agg(count(lit(1)).as("n")).collect()(0).getLong(0)
      def delta(n: Int) = (1 to n).map(i => ("O", i * 1.0))
        .toDF("o_orderstatus", "o_totalprice")
      // three appends under compactEvery=4: each is a NEW generation —
      // the cached base is never re-aggregated (that is the cost shape)
      MaterializedViews.appendIncremental(spark, "mv_gen", delta(2), compactEvery = 4)
      assert(MaterializedViews.generations("mv_gen") == 2)
      assert(rollupN == base + 2)
      MaterializedViews.appendIncremental(spark, "mv_gen", delta(1), compactEvery = 4)
      assert(MaterializedViews.generations("mv_gen") == 3)
      MaterializedViews.appendIncremental(spark, "mv_gen", delta(1), compactEvery = 4)
      assert(MaterializedViews.generations("mv_gen") == 4)
      assert(rollupN == base + 4)
      // the 4th append exceeds the bound: generations compact to ONE and
      // the rollup still answers exactly
      MaterializedViews.appendIncremental(spark, "mv_gen", delta(3), compactEvery = 4)
      assert(MaterializedViews.generations("mv_gen") == 1,
        "compaction must fold every generation back into the base")
      assert(rollupN == base + 7)
      // explicit refresh also compacts
      MaterializedViews.appendIncremental(spark, "mv_gen", delta(1), compactEvery = 4)
      assert(MaterializedViews.generations("mv_gen") == 2)
      MaterializedViews.refreshIncremental(spark, "mv_gen", delta(1))
      assert(MaterializedViews.generations("mv_gen") == 1)
      assert(rollupN == base + 9)
    } finally MaterializedViews.clear()
  }

  test("stream-maintained MV: each micro-batch folds in; counts track the feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    MaterializedViews.register(spark, "mv_live", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      val baseCnt = source.count()
      val mem = MemoryStream[(String, Double)]
      val delta = mem.toDS().toDF("o_orderstatus", "o_totalprice")
      val q = MaterializedViews.maintainFromStream(spark, "mv_live", delta)
      try {
        mem.addData(Seq(("O", 10.0), ("F", 20.0)))
        q.processAllAvailable()
        mem.addData(Seq(("O", 30.0)))
        q.processAllAvailable()
      } finally q.stop()
      // rollup through the rewrite: grand total count = base + 3 streamed
      val n = source.agg(count(lit(1)).as("n")).collect()(0).getLong(0)
      assert(n == baseCnt + 3, s"expected ${baseCnt + 3}, got $n")
    } finally MaterializedViews.clear()
  }

  test("cross-tile subsumption: a query the coarse tile cannot answer rolls up the finer one") {
    MaterializedViews.register(spark, "mv_coarse", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    MaterializedViews.register(spark, "mv_fine", source,
      keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"))
    try {
      // COUNT(DISTINCT priority) needs priority as a tile KEY: the
      // coarse tile can't answer, the finer one can — the sweep must
      // keep probing past the failed candidate (SubstitutionVisitor
      // unification across ALL registered materializations)
      val q = source.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderpriority")).as("p"),
          sum("o_totalprice").as("t"))
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("InMemoryRelation"),
        s"finer tile must answer:\n$plan")
      assert(plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"fact must not be rescanned:\n$plan")
      // the substituted relation must be the FINE tile (it carries the
      // priority key column; the coarse tile does not)
      val cached = plan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(cached.exists(_.output.exists(_.name == "o_orderpriority")),
        s"expected the finer tile's cache:\n$plan")
      val got = q.orderBy("o_orderstatus").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      MaterializedViews.clear()
      val exp = source.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderpriority")).as("p"))
        .orderBy("o_orderstatus").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == exp)
    } finally MaterializedViews.clear()
  }

  test("cost-based tile choice: when several tiles can answer, the smallest adequate one wins") {
    MaterializedViews.register(spark, "mv_fine2", source,
      keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"))
    MaterializedViews.register(spark, "mv_coarse2", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      // BOTH tiles can answer a by-status SUM; the coarse one has fewer
      // rows and must be picked regardless of registration order — the
      // reference's least-cost tile selection (materialize/Lattice.java)
      val q = source.groupBy("o_orderstatus").agg(sum("o_totalprice").as("t"))
      val cached = q.queryExecution.optimizedPlan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(cached.nonEmpty, "tile must answer")
      assert(!cached.exists(_.output.exists(_.name == "o_orderpriority")),
        "the SMALLER (coarse) tile must win the cost choice")
    } finally MaterializedViews.clear()
  }

  test("count-only partials: COUNT over a non-numeric column rolls up without a SUM partial") {
    MaterializedViews.register(spark, "mv_cnts", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"),
      counts = Seq("o_orderpriority"))
    try {
      val q = source.groupBy("o_orderstatus")
        .agg(count(col("o_orderpriority")).as("cp"),
          sum("o_totalprice").as("t"))
        .orderBy("o_orderstatus")
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "COUNT(string col) must roll up from the count-only partial")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      MaterializedViews.clear()
      val exp = source.groupBy("o_orderstatus")
        .agg(count(col("o_orderpriority")).as("cp"))
        .orderBy("o_orderstatus").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == exp)
    } finally MaterializedViews.clear()
  }

  test("stream-fed tile serves ROLLUP between micro-batches; compaction bounds the union depth") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    MaterializedViews.register(spark, "mv_live_gs", source,
      keys = Seq("o_orderstatus", "o_orderpriority"), sums = Seq("o_totalprice"))
    try {
      val baseCnt = source.count()
      val mem = MemoryStream[(String, String, Double)]
      val delta = mem.toDS().toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
      val q = MaterializedViews.maintainFromStream(spark, "mv_live_gs", delta,
        compactEvery = 3)
      try {
        def rollupTotal(): Long = {
          val r = source.rollup(col("o_orderstatus"))
            .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
          // the grouping-set query must ride the tile, not the fact
          val plan = r.queryExecution.optimizedPlan
          assert(plan.toString.contains("InMemoryRelation"),
            s"ROLLUP must ride the stream-fed tile:\n$plan")
          assert(plan.collect {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
          }.isEmpty, "fact must not be rescanned")
          r.filter(col("gid") === 1).collect()(0).getLong(1) // grand total
        }
        assert(rollupTotal() == baseCnt)
        // five micro-batches at compactEvery=3: generations must never
        // exceed the bound, and every ROLLUP answers fresh in between
        (1 to 5).foreach { i =>
          mem.addData(Seq(("O", "1-URGENT", i * 1.0)))
          q.processAllAvailable()
          assert(rollupTotal() == baseCnt + i, s"after batch $i")
          assert(MaterializedViews.generations("mv_live_gs") <= 3,
            "compaction must bound the generation count")
        }
      } finally q.stop()
    } finally MaterializedViews.clear()
  }

  test("mixed sums + derived measures survive compaction THEN append (partial-layout parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvmix").toString + "/t"
    Seq((1L, "a", 10.0, 2.0), (2L, "b", 20.0, 4.0))
      .toDF("id", "tag", "amt", "disc").write.parquet(dir)
    def src = spark.read.parquet(dir)
    def mk(rows: (Long, String, Double, Double)*) =
      rows.toDF("id", "tag", "amt", "disc")
    try {
      MaterializedViews.register(spark, "mv_mixed", src,
        keys = Seq("tag"), sums = Seq("amt"),
        sumExprs = Seq("rev" -> (col("amt") * col("disc"))))
      // refresh → the COMPACTED column layout (mergePartialCols)…
      MaterializedViews.refreshIncremental(spark, "mv_mixed", mk((3L, "a", 30.0, 1.0)))
      // …then a generation APPEND (partialAggCols layout): the target
      // unions the two layouts POSITIONALLY — with both plain sums and
      // derived measures present, the cntn blocks must line up
      MaterializedViews.appendIncremental(spark, "mv_mixed", mk((4L, "b", 40.0, 0.5)))
      val q = src.groupBy("tag")
        .agg(count(col("amt")).as("ca"), avg(col("amt")).as("aa"),
          sum(col("amt") * col("disc")).as("r"),
          count(col("amt") * col("disc")).as("cr"))
        .orderBy("tag")
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
      val got = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq
      // tile is FRESHER than the files (deltas not in files): expected
      // values computed over base + both deltas
      assert(got == Seq(("a", 2L, 20.0, 50.0, 2L), ("b", 2L, 30.0, 100.0, 2L)),
        s"got $got")
    } finally MaterializedViews.clear()
  }

  test("registerOnce keeps a live same-signature MV and replaces a different one") {
    val a = MaterializedViews.registerOnce(spark, "mv_once", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      // same name + same signature + same spec: the live tile is kept
      val b = MaterializedViews.registerOnce(spark, "mv_once", source,
        keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
      assert(a eq b, "identical re-registration must return the live MV frame")
      // same name, DIFFERENT source: the guard must NOT leave the stale
      // tile answering for a dataset it never saw — it re-registers
      val li = T(spark, sfDir, "lineitem")
      MaterializedViews.registerOnce(spark, "mv_once", li,
        keys = Seq("l_returnflag"), sums = Seq("l_quantity"))
      val q = li.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "the re-registered tile must answer the new source's rollup")
    } finally MaterializedViews.clear()
  }

  test("CUBE over tile keys is answered from the cache, values identical") {
    def q = source.filter(col("o_orderdate") >= lit("1996-01-01"))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), avg("o_totalprice").as("a"),
        count(col("o_totalprice")).as("cn"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    val expected = q.collect()
    // the tile is WIDER-keyed and WIDER-filtered than the query: the
    // extra key merges away, the narrower date range re-applies as the
    // compensating filter on the tile (o_orderdate is a key)
    MaterializedViews.register(spark, "mv_cube",
      source.filter(col("o_orderdate") >= lit("1995-01-01")),
      keys = Seq("o_orderstatus", "o_orderpriority", "o_orderdate"),
      sums = Seq("o_totalprice"))
    try {
      val q2 = q
      val lp = q2.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"), s"expected tile scan:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"source must not be rescanned:\n$lp")
      val got = q2.collect()
      assert(got.length == expected.length)
      // AVG over a raw-double column rolls up as Σ(partial sums)/Σ(counts),
      // which re-associates the double accumulation — ulp-level tolerance,
      // exactly like the plain-rollup value-parity case above. The counts
      // and grouping ids are exact.
      got.zip(expected).foreach { case (g, e) =>
        assert(g.get(0) == e.get(0) && g.get(1) == e.get(1))
        assert(g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) <= 1e-9 * math.abs(e.getDouble(3)))
        assert(g.getLong(4) == e.getLong(4) && g.getLong(5) == e.getLong(5))
      }
    } finally MaterializedViews.clear()
  }

  test("ROLLUP over a STAR-JOIN source rides the star tile — zero fact scans") {
    val orders = source.withColumn("o_totalprice", T.dec2(col("o_totalprice")))
    val customer = T(spark, sfDir, "customer")
    def star = orders.join(customer, col("o_custkey") === col("c_custkey"))
    def q = star.rollup(col("o_orderstatus"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum("o_totalprice").cast("double").as("rev"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("c_nationkey"))
    val expected = q.collect().map(_.toString).toSeq
    MaterializedViews.registerOnce(spark, "mv_star_gs", star,
      keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
    try {
      val q2 = q
      val lp = q2.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the star rollup must be answered from the tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"neither star side may be rescanned:\n$lp")
      // decimal partials make the substituted grouping-set result
      // bit-identical, not just tolerance-close
      assert(q2.collect().map(_.toString).toSeq == expected)
    } finally MaterializedViews.clear()
  }

  test("ROLLUP composes with COUNT(DISTINCT key) and HLL approx-distinct from the tile") {
    def q = source.rollup(col("o_orderstatus"))
      .agg(countDistinct(col("o_orderpriority")).as("dp"),
        approx_count_distinct(col("o_custkey")).as("ac"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"))
    val expected = q.collect()
    MaterializedViews.register(spark, "mv_gs_d", source,
      keys = Seq("o_orderstatus", "o_orderpriority"),
      sums = Nil, approxDistincts = Seq("o_custkey"))
    try {
      val q2 = q
      val lp = q2.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"distinct-over-key + sketch rollup must ride the tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
      val got = q2.collect()
      assert(got.length == expected.length)
      got.zip(expected).foreach { case (g, e) =>
        assert(g.get(0) == e.get(0))
        // exact: distinct key count, plain count, grouping id
        assert(g.getLong(1) == e.getLong(1) && g.getLong(3) == e.getLong(3) &&
          g.getLong(4) == e.getLong(4))
        // approximate: the Datasketches-union estimate replaces the HLL++
        // builtin — same ~2% contract as the non-grouping-set substitution
        val (a, b) = (g.getLong(2).toDouble, e.getLong(2).toDouble)
        assert(math.abs(a - b) <= 0.05 * math.max(a, b) + 2,
          s"sketch estimate too far: got $a want ~$b")
      }
    } finally MaterializedViews.clear()
  }

  test("a grouping alias sharing a key's NAME rebinds through its definition, not the raw key") {
    // ROLLUP(date_trunc('year', d).as("o_orderdate")): the alias collides
    // with the day-grain tile key by NAME. The entry must rebind through
    // the alias DEFINITION (year granularity) — rebinding to the raw key
    // would silently emit per-day groups
    def q = source.rollup(date_trunc("year", col("o_orderdate")).as("o_orderdate"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderdate"))
    val expected = q.collect().map(_.toString).toSeq
    MaterializedViews.register(spark, "mv_name_clash", source,
      keys = Seq("o_orderstatus", "o_orderdate"), sums = Nil)
    try {
      val q2 = q
      val lp = q2.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the year-trunc rollup must still ride the day tile:\n$lp")
      val got = q2.collect().map(_.toString).toSeq
      assert(got == expected,
        s"alias-named-like-key must keep YEAR granularity: got ${got.take(3)}")
      assert(got.length < 30, "per-day groups would mean the raw key leaked in")
    } finally MaterializedViews.clear()
  }

  test("rollup aggregates over the KEY passthrough ride the tile; non-key groupings block") {
    MaterializedViews.register(spark, "mv_gs", source,
      keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
    try {
      // grouping column o_orderpriority is not a tile key — blocked
      val q1 = source.rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!q1.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "a grouping column outside the tile keys must block the rewrite")
      assert(q1.count() > 0)
      // MIN(status) in a rollup reads the PASSTHROUGH column (Spark
      // resolves the aggregate argument against the pre-grouping value,
      // not the per-set nulled copy), so it commutes with the tile
      // merge: per grouping set, the tile rows carry the same key value
      // set as the source rows. Rewritten AND identical.
      def q2 = source.rollup(col("o_orderstatus"))
        .agg(min(col("o_orderstatus")).as("m"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"))
      val lp = q2.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"MIN over the key passthrough must ride the tile:\n$lp")
      val got = q2.collect()
      MaterializedViews.clear()
      assert(got.map(_.toString).toSeq == q2.collect().map(_.toString).toSeq)
    } finally MaterializedViews.clear()
  }
}
