package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 9 (ds64–ds72): the week-over-week ratio join
  * (Q2), the two-channel year-over-year growth compare (Q4), the
  * dimension-filtered average panel (Q7), the preferred-nation
  * semi-join census (Q8), the count-gated bucket panel (Q9), the
  * channel-intersection with a scalar revenue threshold (Q14), the
  * cross-nation brand census (Q19), the product-hierarchy rollup
  * (Q22), and the HAVING-vs-5%-of-average panel (Q24).
  *
  * Shapes re-expressed on the TPC-H-ish testdata star (reference
  * queries: plus/src/test/resources/sql/tpcds/01..99.sql — the
  * reference itself only parses/plans these; here each runs AND
  * hash-matches DuckDB). Determinism contract as packs 2–8: all money
  * lands in integer cents, averages/ratios in integer milli/ppm units
  * via integer division (DIV here, // in DuckDB — identical floor on
  * the non-negative operands used), so the driver's %.6f hash sees
  * only integers and strings.
  */
object Tpcds9 {

  /** Q2 shape: per-(week, day-of-week) revenue joined against the NEXT
    * week's same day — the shifted-key self-join — with the ratio as
    * integer ppm. Week/dow derive from pure day arithmetic off the
    * shared pre-domain Monday epoch (T.weekSeq/T.dow — truncation,
    * floor, pmod and % all agree on its non-negative diffs), not
    * engine week functions (ISO-week rules differ across engines). */
  val ds64_week_over_week = Q(
    (s, dir) => {
      val wk = T(s, dir, "lineitem")
        .select(T.weekSeq(col("l_shipdate")).as("week_seq"),
          T.dow(col("l_shipdate")).cast(IntegerType).as("dow"),
          col("l_extendedprice"))
        .groupBy(col("week_seq"), col("dow"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
      val cur = wk.select(col("week_seq"), col("dow"), col("cents").as("cur_cents"))
      val nxt = wk.select((col("week_seq") - 1).as("week_seq"), col("dow"),
        col("cents").as("next_cents"))
      cur.join(nxt, Seq("week_seq", "dow"))
        .filter(col("next_cents") > 0 && col("week_seq") % 13 === 0)
        .select(col("week_seq"), col("dow"), col("cur_cents"), col("next_cents"),
          expr("cur_cents * 1000000 DIV next_cents").as("ratio_ppm"))
        .orderBy(col("week_seq"), col("dow"))
    },
    Some("""
      WITH wk AS (
        SELECT CAST(FLOOR(date_diff('day', TIMESTAMP '1970-01-05', l_shipdate) / 7.0) AS BIGINT) AS week_seq,
          CAST(date_diff('day', TIMESTAMP '1970-01-05', l_shipdate) % 7 AS INT) AS dow,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2)
      SELECT c.week_seq, c.dow, c.cents AS cur_cents, n.cents AS next_cents,
        CAST(c.cents * 1000000 // n.cents AS BIGINT) AS ratio_ppm
      FROM wk c JOIN wk n ON n.week_seq = c.week_seq + 1 AND n.dow = c.dow
      WHERE n.cents > 0 AND c.week_seq % 13 = 0
      ORDER BY c.week_seq, c.dow"""))

  /** Q4 shape: customers whose channel-1 (linestatus F) revenue grew
    * FASTER from 1996 to 1997 than their channel-2 (linestatus O)
    * revenue — the growth compare runs as an exact integer
    * cross-multiplication, never a float division. */
  val ds65_two_channel_growth = Q(
    (s, dir) => {
      def slice(st: String, yr: Int) =
        sum(when(col("l_linestatus") === st && year(col("l_shipdate")) === yr,
          T.dec2(col("l_extendedprice"))).otherwise(T.dec2(lit(0))))
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg((slice("F", 1996) * 100).cast(LongType).as("f96"),
          (slice("F", 1997) * 100).cast(LongType).as("f97"),
          (slice("O", 1996) * 100).cast(LongType).as("o96"),
          (slice("O", 1997) * 100).cast(LongType).as("o97"))
        .filter(col("f96") > 0 && col("o96") > 0 && col("f97") > 0 && col("o97") > 0 &&
          col("f97") * col("o96") > col("o97") * col("f96"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey,
        CAST(SUM(CASE WHEN l_linestatus = 'F' AND EXTRACT(YEAR FROM l_shipdate) = 1996 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS f96,
        CAST(SUM(CASE WHEN l_linestatus = 'F' AND EXTRACT(YEAR FROM l_shipdate) = 1997 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS f97,
        CAST(SUM(CASE WHEN l_linestatus = 'O' AND EXTRACT(YEAR FROM l_shipdate) = 1996 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS o96,
        CAST(SUM(CASE WHEN l_linestatus = 'O' AND EXTRACT(YEAR FROM l_shipdate) = 1997 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS o97
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
      HAVING f96 > 0 AND o96 > 0 AND f97 > 0 AND o97 > 0 AND f97 * o96 > o97 * f96
      ORDER BY o_custkey"""))

  /** Q7 shape: the demographic-filtered average panel — per brand,
    * average quantity / price / discount over the BUILDING segment's
    * lines, each average as an exact integer (milli-units / basis
    * points) from a sum-and-count pair. */
  val ds66_avg_panel = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(LongType)).as("sq"),
          (sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("sp"),
          sum(round(col("l_discount") * 10000).cast(LongType)).as("sd"))
        .select(col("p_brand"), col("n"),
          expr("sq * 1000 DIV n").as("avg_qty_milli"),
          expr("sp DIV n").as("avg_price_cents"),
          expr("sd DIV n").as("avg_disc_bp"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000 // COUNT(*) AS BIGINT) AS avg_qty_milli,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) // COUNT(*) AS BIGINT) AS avg_price_cents,
        CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_disc_bp
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Q8 shape: the preferred-zip semi-join — revenue by nation
    * restricted to nations with an ABOVE-AVERAGE count of well-funded
    * customers (the relative bar is scale-free: selective at every sf
    * where an absolute count is empty at small scales); the derived
    * key set semi-joins the fact path, nothing collects. */
  val ds67_preferred_nations = Q(
    (s, dir) => {
      val rich = T(s, dir, "customer")
        .filter(col("c_acctbal") > 5000.0)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_rich"))
      val tot = rich.agg(sum(col("n_rich")).as("tot"), count(lit(1)).as("n_nat"))
      val preferred = rich.crossJoin(broadcast(tot)) // 1 row: global agg
        .filter(col("n_rich") * col("n_nat") > col("tot"))
        .select(col("c_nationkey").as("pref_nk"))
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(preferred, col("c_nationkey") === col("pref_nk"), "left_semi")
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        COUNT(*) AS n_lines
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE c_nationkey IN (
        SELECT c_nationkey
        FROM (SELECT c_nationkey, COUNT(*) AS n_rich FROM customer
              WHERE c_acctbal > 5000 GROUP BY c_nationkey) r,
             (SELECT SUM(n_rich) AS tot, COUNT(*) AS n_nat
              FROM (SELECT c_nationkey, COUNT(*) AS n_rich FROM customer
                    WHERE c_acctbal > 5000 GROUP BY c_nationkey)) t
        WHERE n_rich * n_nat > tot)
      GROUP BY n_name ORDER BY n_name"""))

  /** Q9 shape: the count-gated bucket panel — five quantity bands in
    * ONE conditional-aggregation scan; each band reports its revenue
    * when busy (count above the gate) and its discount total when not.
    * The whole panel is a single row, no five scalar-subquery scans. */
  val ds68_gated_buckets = Q(
    (s, dir) => {
      def band(lo: Int, hi: Int) = col("l_quantity").between(lo, hi)
      def cnt(lo: Int, hi: Int) = sum(when(band(lo, hi), 1L).otherwise(0L))
      def cents(lo: Int, hi: Int) =
        (sum(when(band(lo, hi), T.dec2(col("l_extendedprice"))).otherwise(T.dec2(lit(0)))) * 100)
          .cast(LongType)
      def discBp(lo: Int, hi: Int) =
        sum(when(band(lo, hi), round(col("l_discount") * 10000).cast(LongType)).otherwise(0L))
      def gated(lo: Int, hi: Int) =
        when(cnt(lo, hi) > 2400, cents(lo, hi)).otherwise(discBp(lo, hi))
      T(s, dir, "lineitem").agg(
        gated(1, 10).as("b1"), gated(11, 20).as("b2"), gated(21, 30).as("b3"),
        gated(31, 40).as("b4"), gated(41, 50).as("b5"))
    },
    Some("""
      SELECT
        CASE WHEN SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 ELSE 0 END) > 2400
          THEN CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT)
          ELSE CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN CAST(ROUND(l_discount * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) END AS b1,
        CASE WHEN SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 ELSE 0 END) > 2400
          THEN CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT)
          ELSE CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN CAST(ROUND(l_discount * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) END AS b2,
        CASE WHEN SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 ELSE 0 END) > 2400
          THEN CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT)
          ELSE CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN CAST(ROUND(l_discount * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) END AS b3,
        CASE WHEN SUM(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 ELSE 0 END) > 2400
          THEN CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT)
          ELSE CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN CAST(ROUND(l_discount * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) END AS b4,
        CASE WHEN SUM(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 ELSE 0 END) > 2400
          THEN CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT)
          ELSE CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN CAST(ROUND(l_discount * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) END AS b5
      FROM lineitem"""))

  /** Q14 shape: the cross-channel item intersection — parts sold in
    * BOTH linestatus channels — then brand revenue over those parts,
    * kept only above the all-brand average (the scalar threshold rides
    * an exact integer cross-multiply, n_brands × rev vs total). */
  val ds69_channel_intersect = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val both = li.filter(col("l_linestatus") === "F").select(col("l_partkey")).distinct()
        .intersect(li.filter(col("l_linestatus") === "O").select(col("l_partkey")).distinct())
      val brandRev = li
        .join(both, Seq("l_partkey"), "left_semi")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
      val tot = brandRev.agg(sum(col("cents")).as("total_cents"),
        count(lit(1)).as("n_brands"))
      brandRev.crossJoin(broadcast(tot)) // 1 row: global agg
        .filter(col("cents") * col("n_brands") > col("total_cents"))
        .select(col("p_brand"), col("cents"))
        .orderBy(col("p_brand"))
    },
    Some("""
      WITH both_ch AS (
        SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O'),
      brand_rev AS (
        SELECT p_brand,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT l_partkey FROM both_ch)
        GROUP BY p_brand)
      SELECT p_brand, cents FROM brand_rev
      WHERE cents * (SELECT COUNT(*) FROM brand_rev) > (SELECT SUM(cents) FROM brand_rev)
      ORDER BY p_brand"""))

  /** Q19 shape: the cross-nation brand census — PROMO lines whose
    * customer and supplier sit in DIFFERENT nations (the ship-to-a-
    * different-zip predicate), revenue and count per brand. */
  val ds70_cross_nation_brands = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_type").startsWith("PROMO"))
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("p_brand"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        COUNT(*) AS n_lines
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_type LIKE 'PROMO%' AND c_nationkey <> s_nationkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Q22 shape: the product-hierarchy rollup — average quantity at
    * (manufacturer, brand, size-band), brand, manufacturer, and grand
    * grains in one ROLLUP, the average as an exact milli-integer. */
  val ds71_hierarchy_rollup = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .select(substring(col("p_brand"), 7, 1).as("mfgr"), col("p_brand"),
          floor((col("p_size") - 1) / 10).cast(LongType).as("size_band"),
          col("l_quantity"))
        .rollup(col("mfgr"), col("p_brand"), col("size_band"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast(LongType)).as("sq"),
          grouping_id().cast(LongType).as("gid"))
        .select(col("mfgr"), col("p_brand"), col("size_band"), col("gid"), col("n"),
          expr("sq * 1000 DIV n").as("avg_qty_milli"))
        .orderBy(col("gid"), col("mfgr"), col("p_brand"), col("size_band")),
    Some("""
      SELECT mfgr, p_brand, size_band,
        CAST(GROUPING(mfgr) * 4 + GROUPING(p_brand) * 2 + GROUPING(size_band) AS BIGINT) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000 // COUNT(*) AS BIGINT) AS avg_qty_milli
      FROM (
        SELECT SUBSTRING(p_brand, 7, 1) AS mfgr, p_brand,
          CAST(FLOOR((p_size - 1) / 10.0) AS BIGINT) AS size_band, l_quantity
        FROM lineitem JOIN part ON l_partkey = p_partkey)
      GROUP BY ROLLUP(mfgr, p_brand, size_band)
      ORDER BY gid, mfgr, p_brand, size_band"""))

  /** Q24 shape: (customer, brand) revenue kept only above 5% of the
    * average group revenue — the scalar rides a one-row broadcast and
    * the 5%-of-average compare is the exact integer inequality
    * 20 · n_groups · cents > total_cents. */
  val ds72_five_pct_of_avg = Q(
    (s, dir) => {
      val grp = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_size") < 15)
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("p_brand"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
      val tot = grp.agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_groups"))
      grp.crossJoin(broadcast(tot)) // 1 row: global agg
        .filter(col("cents") * 20 * col("n_groups") > col("total_cents"))
        .select(col("o_custkey"), col("p_brand"), col("cents"))
        .orderBy(col("o_custkey"), col("p_brand"))
    },
    Some("""
      WITH grp AS (
        SELECT o_custkey, p_brand,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE p_size < 15
        GROUP BY o_custkey, p_brand)
      SELECT o_custkey, p_brand, cents FROM grp
      WHERE cents * 20 * (SELECT COUNT(*) FROM grp) > (SELECT SUM(cents) FROM grp)
      ORDER BY o_custkey, p_brand"""))

  val all: Map[String, Q] = Map(
    "ds64_week_over_week" -> ds64_week_over_week,
    "ds65_two_channel_growth" -> ds65_two_channel_growth,
    "ds66_avg_panel" -> ds66_avg_panel,
    "ds67_preferred_nations" -> ds67_preferred_nations,
    "ds68_gated_buckets" -> ds68_gated_buckets,
    "ds69_channel_intersect" -> ds69_channel_intersect,
    "ds70_cross_nation_brands" -> ds70_cross_nation_brands,
    "ds71_hierarchy_rollup" -> ds71_hierarchy_rollup,
    "ds72_five_pct_of_avg" -> ds72_five_pct_of_avg)
}
