package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 10 (ds73–ds81): the sold-vs-returned channel
  * join (Q25), the six-band distinct-stats panel (Q28), the
  * sold/returned/resold item triple (Q29), the excess-discount
  * correlated compare (Q32), the three-period customer intersection
  * (Q38), the day-of-week pivot (Q43), the OR-of-memberships census
  * (Q45), the cross-nation big-ticket orders (Q46), and the ship-lag
  * bucket panel (Q50).
  *
  * Same determinism contract as pack 9 (integer cents / milli / bp,
  * DIV vs //, day arithmetic instead of week functions).
  */
object Tpcds10 {

  /** Q25 shape: parts with BOTH a sold and a returned channel — one
    * conditional-aggregation scan per part (no second fact pass), both
    * channels required, then the brand grain. */
  val ds73_sold_vs_returned = Q(
    (s, dir) => {
      val perPart = T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(
          (sum(when(col("l_returnflag") =!= "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))) * 100).cast(LongType).as("sold_cents"),
          (sum(when(col("l_returnflag") === "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))) * 100).cast(LongType).as("ret_cents"))
        .filter(col("sold_cents") > 0 && col("ret_cents") > 0)
      perPart
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("sold_cents")).as("sold_cents"),
          sum(col("ret_cents")).as("ret_cents"))
        .select(col("p_brand"), col("n_parts"), col("sold_cents"), col("ret_cents"),
          (col("sold_cents") - col("ret_cents")).as("net_cents"))
        .orderBy(col("p_brand"))
    },
    Some("""
      WITH per_part AS (
        SELECT l_partkey,
          CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS sold_cents,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS ret_cents
        FROM lineitem GROUP BY l_partkey
        HAVING sold_cents > 0 AND ret_cents > 0)
      SELECT p_brand, COUNT(*) AS n_parts,
        CAST(SUM(sold_cents) AS BIGINT) AS sold_cents,
        CAST(SUM(ret_cents) AS BIGINT) AS ret_cents,
        CAST(SUM(sold_cents) - SUM(ret_cents) AS BIGINT) AS net_cents
      FROM per_part JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Q28 shape: the six-band stats panel — count / distinct prices /
    * floored average price per quantity band, ONE scan, one row out.
    * The distinct counts ride conditional COUNT(DISTINCT CASE ...). */
  val ds74_band_stats_panel = Q(
    (s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast(LongType)
      def band(i: Int) = col("l_quantity").between(i * 10 - 9, i * 10)
      def stats(i: Int) = Seq(
        sum(when(band(i), 1L).otherwise(0L)).as(s"cnt$i"),
        countDistinct(when(band(i), cents)).as(s"nd$i"),
        sum(when(band(i), cents).otherwise(0L)).as(s"sp$i"))
      val aggs = (1 to 5).flatMap(stats)
      T(s, dir, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
        .select((1 to 5).flatMap(i => Seq(
          col(s"cnt$i"), col(s"nd$i"),
          expr(s"sp$i DIV cnt$i").as(s"avg_cents$i"))): _*)
    },
    Some {
      val cols = (1 to 5).map { i =>
        val lo = i * 10 - 9; val hi = i * 10
        s"""COUNT(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN 1 END) AS cnt$i,
        COUNT(DISTINCT CASE WHEN l_quantity BETWEEN $lo AND $hi THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS nd$i,
        CAST(SUM(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) ELSE 0 END)
          // SUM(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END) AS BIGINT) AS avg_cents$i"""
      }.mkString(",\n        ")
      s"SELECT\n        $cols\n      FROM lineitem"
    })

  /** Q29 shape: items sold in 1996, returned in 1996, and sold again
    * in 1997 — all three legs from ONE conditional per-part aggregate,
    * every leg required positive. */
  val ds75_sold_returned_resold = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(
          sum(when(year(col("l_shipdate")) === 1996 && col("l_returnflag") =!= "R",
            col("l_quantity").cast(LongType)).otherwise(0L)).as("q_sold96"),
          sum(when(year(col("l_shipdate")) === 1996 && col("l_returnflag") === "R",
            col("l_quantity").cast(LongType)).otherwise(0L)).as("q_ret96"),
          sum(when(year(col("l_shipdate")) === 1997 && col("l_returnflag") =!= "R",
            col("l_quantity").cast(LongType)).otherwise(0L)).as("q_sold97"))
        .filter(col("q_sold96") > 0 && col("q_ret96") > 0 && col("q_sold97") > 0)
        .orderBy(col("l_partkey")),
    Some("""
      SELECT l_partkey,
        CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1996 AND l_returnflag <> 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_sold96,
        CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1996 AND l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_ret96,
        CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1997 AND l_returnflag <> 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_sold97
      FROM lineitem
      GROUP BY l_partkey
      HAVING q_sold96 > 0 AND q_ret96 > 0 AND q_sold97 > 0
      ORDER BY l_partkey"""))

  /** Q32 shape: excess discount — revenue of lines whose discount
    * exceeds 1.3× their part's average discount. The correlated scalar
    * decorrelates to a per-part aggregate join; the 1.3× compare is the
    * exact integer inequality 10·bp·n > 13·Σbp. */
  val ds76_excess_discount = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"),
          round(col("l_discount") * 10000).cast(LongType).as("bp"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("bp")).as("sum_bp"), count(lit(1)).as("n"))
      li.join(perPart, Seq("l_partkey"))
        .filter(col("bp") * col("n") * 10 > col("sum_bp") * 13)
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("excess_cents"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      WITH per_part AS (
        SELECT l_partkey, SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS sum_bp,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey)
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS excess_cents,
        COUNT(*) AS n_lines
      FROM lineitem JOIN per_part USING (l_partkey)
      WHERE CAST(ROUND(l_discount * 10000) AS BIGINT) * n * 10 > sum_bp * 13"""))

  /** Q38 shape: customers active in ALL THREE periods — the
    * three-way INTERSECT of distinct key sets, counted. */
  val ds77_three_period_customers = Q(
    (s, dir) => {
      val o = T(s, dir, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey")).distinct()
      yr(1995).intersect(yr(1996)).intersect(yr(1997))
        .agg(count(lit(1)).as("n_loyal"))
    },
    Some("""
      SELECT COUNT(*) AS n_loyal FROM (
        SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997)"""))

  /** Q43 shape: the day-of-week pivot — one row per supplier nation,
    * seven conditional revenue columns. Day-of-week is T.dow — day
    * arithmetic off the shared pre-domain Monday epoch (0=Mon..6=Sun),
    * never an engine dow call. */
  val ds78_dow_pivot = Q(
    (s, dir) => {
      val dow = T.dow(col("l_shipdate"))
      def d(i: Int) =
        (sum(when(dow === i, T.dec2(col("l_extendedprice"))).otherwise(T.dec2(lit(0)))) * 100)
          .cast(LongType).as(s"d$i")
      T(s, dir, "lineitem")
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(d(0), d(1), d(2), d(3), d(4), d(5), d(6))
        .orderBy(col("n_name"))
    },
    Some {
      val cols = (0 to 6).map { i =>
        s"CAST(SUM(CASE WHEN date_diff('day', TIMESTAMP '1970-01-05', l_shipdate) % 7 = $i THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS d$i"
      }.mkString(",\n        ")
      s"""SELECT n_name,
        $cols
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""
    })

  /** Q45 shape: the OR-of-memberships census — customers in a fixed
    * key-mod list OR in the derived big-spender set. The row-local
    * mod predicate stays a filter; the derived set joins in as a
    * unique-keyed flag (left join, no duplication), so the OR costs
    * ONE customer pass and one keyed join — never a union of fact
    * scans. */
  val ds79_or_membership = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = T(s, dir, "orders")
      val bigSpenders = o.groupBy(col("o_custkey"))
        .agg(sum(T.dec2(col("o_totalprice"))).as("tot"))
        .filter(col("tot") > 1500000.0)
        .select(col("o_custkey").as("k"), lit(1).as("bs"))
      o.join(cust, col("o_custkey") === col("c_custkey"))
        .join(bigSpenders, col("c_custkey") === col("k"), "left")
        .filter((col("c_custkey") % 100 isin (5, 17, 23, 42, 77)) || col("bs") === 1)
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(T.dec2(col("o_totalprice"))) * 100).cast(LongType).as("cents"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        COUNT(*) AS n_orders
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE c_custkey % 100 IN (5, 17, 23, 42, 77)
         OR c_custkey IN (
           SELECT o_custkey FROM orders GROUP BY o_custkey
           HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 1500000)
      GROUP BY n_name ORDER BY n_name"""))

  /** Q46 shape: big-ticket cross-nation orders — per order, total
    * cents and a did-any-line-cross-nations flag from one aggregate
    * over the joined lines; only crossing orders above the bar. */
  val ds80_cross_nation_orders = Q(
    (s, dir) => {
      val perOrder = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"),
          max(when(col("s_nationkey") =!= col("c_nationkey"), 1L).otherwise(0L)).as("crossed"),
          count(lit(1)).as("n_lines"))
      perOrder.filter(col("crossed") === 1 && col("cents") > 30000000L)
        .select(col("o_orderkey"), col("o_custkey"), col("n_lines"), col("cents"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      GROUP BY o_orderkey, o_custkey
      HAVING MAX(CASE WHEN s_nationkey <> c_nationkey THEN 1 ELSE 0 END) = 1
         AND SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 > 30000000
      ORDER BY o_orderkey"""))

  /** Q50 shape: the ship-lag bucket panel — days from order to ship
    * bucketed ≤30/60/90/120/over, counted per supplier nation in one
    * conditional-aggregation pass. */
  val ds81_ship_lag_buckets = Q(
    (s, dir) => {
      val lag = datediff(col("l_shipdate"), col("o_orderdate"))
      def b(name: String, cond: org.apache.spark.sql.Column) =
        sum(when(cond, 1L).otherwise(0L)).as(name)
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(b("d30", lag <= 30), b("d60", lag > 30 && lag <= 60),
          b("d90", lag > 60 && lag <= 90), b("d120", lag > 90 && lag <= 120),
          b("dover", lag > 120))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 1 END) AS d30,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30 AND date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 1 END) AS d60,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 AND date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 1 END) AS d90,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 AND date_diff('day', o_orderdate, l_shipdate) <= 120 THEN 1 END) AS d120,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120 THEN 1 END) AS dover
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  val all: Map[String, Q] = Map(
    "ds73_sold_vs_returned" -> ds73_sold_vs_returned,
    "ds74_band_stats_panel" -> ds74_band_stats_panel,
    "ds75_sold_returned_resold" -> ds75_sold_returned_resold,
    "ds76_excess_discount" -> ds76_excess_discount,
    "ds77_three_period_customers" -> ds77_three_period_customers,
    "ds78_dow_pivot" -> ds78_dow_pivot,
    "ds79_or_membership" -> ds79_or_membership,
    "ds80_cross_nation_orders" -> ds80_cross_nation_orders,
    "ds81_ship_lag_buckets" -> ds81_ship_lag_buckets)
}
