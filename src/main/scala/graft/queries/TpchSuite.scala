package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full 22-query TPC-H suite, adapted to the testdata star schema
  * and run as ONE registration (a75) — composed-plan parity evidence
  * beyond the per-operator Layer-A rows (r10 verdict #9).
  *
  * Design: the SAME SQL text executes on BOTH engines — Spark runs it
  * here over temp views of the parquet tables; the committed oracle is
  * the identical string, so the parity claim is "a DuckDB user's
  * composed TPC-H workload runs on this engine unchanged", not "two
  * hand-kept translations agree". That constrains the text to the
  * dialect intersection; the adaptations:
  *
  *  - Schema: the testdata has no partsupp table and no
  *    commitdate/receiptdate/shipmode/phone columns, so Q2/Q11/Q16/Q20
  *    route their supplier-part relationships through lineitem, Q4/Q21
  *    define "late" as l_shipdate > o_orderdate, Q12 derives its mode
  *    buckets from l_linenumber parity, and Q22 buckets customers by
  *    c_nationkey instead of phone prefix. Every query keeps its
  *    published PLAN SHAPE: Q2/Q15/Q17/Q22 correlated or scalar
  *    subqueries, Q4/Q21 (NOT) EXISTS semi/anti joins, Q13 outer-join
  *    distribution, Q18 IN-over-HAVING, Q19 disjunctive
  *    predicate-pushdown brackets, Q16 NOT IN + COUNT(DISTINCT).
  *  - Exactness: every money aggregate is integer-cents arithmetic
  *    (CAST(ROUND(x*100)) — the repo-wide cents trick), so the
  *    cross-engine hash compare is exact, never float-luck; Q11's
  *    fraction threshold is a multiply (×500), never a division; the
  *    Q22 average is an AVG over BIGINTs (exact integer sum in both
  *    engines, one exact division). Intermediates are sized to stay
  *    under 2^63 at sf0.1 — DuckDB ERRORS on BIGINT wrap (the
  *    graft-gotchas rule), so Q1's charge term uses cents×percent
  *    ×percent (≤ 2e11/row), Q9/Q11 use whole-unit quantities.
  *  - Each query reduces to (q, n_rows, chk): chk folds the query's
  *    own output columns (keys + exact aggregates) through SUM, so
  *    any row-level divergence moves the signature. Top-k queries
  *    (Q3/Q10) carry deterministic tie-breaks (revenue DESC, key ASC).
  *
  * 100 TB posture: identical to the Layer-A rows — these are pure
  * declarative plans (no UDFs, no collects); Catalyst broadcasts the
  * dimension sides (nation/region/supplier), pushes every date/brand
  * filter into the parquet scans, and AQE handles the rest. The suite
  * is registered for correctness, not the bench (the Layer-A 7 stay
  * the BASELINE.md-comparable subset).
  */
object TpchSuite {
  private val tables =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem")

  def run(s: SparkSession, d: String): DataFrame = {
    tables.foreach(t =>
      s.read.parquet(d + "/" + t + ".parquet").createOrReplaceTempView(t))
    s.sql(Sql)
  }

  /** Dialect-intersection SQL (Spark ∩ DuckDB) — also the committed
    * oracle text, verbatim. */
  val Sql: String =
"""SELECT 'q01' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + c2 + c3 + c4 + c5), 0) AS BIGINT) AS chk FROM (
SELECT l_returnflag, l_linestatus,
       SUM(CAST(ROUND(l_quantity*100,0) AS BIGINT)) AS c1,
       SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS c2,
       SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS c3,
       SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100,0) AS BIGINT))) AS c4,
       COUNT(*) AS c5
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
 GROUP BY l_returnflag, l_linestatus
) t_q01
UNION ALL
SELECT 'q02' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(p_partkey + s_suppkey), 0) AS BIGINT) AS chk FROM (
SELECT p_partkey, s_suppkey
  FROM part, supplier, lineitem
 WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND p_size = 15
   AND s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2, lineitem l2
                     WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey)
 GROUP BY p_partkey, s_suppkey
) t_q02
UNION ALL
SELECT 'q03' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(l_orderkey + c1), 0) AS BIGINT) AS chk FROM (
SELECT l_orderkey, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS c1
  FROM customer, orders, lineitem
 WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
   AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
 GROUP BY l_orderkey
 ORDER BY c1 DESC, l_orderkey LIMIT 10
) t_q03
UNION ALL
SELECT 'q04' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + LENGTH(o_orderpriority)), 0) AS BIGINT) AS chk FROM (
SELECT o_orderpriority, COUNT(*) AS c1
  FROM orders
 WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
   AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
 GROUP BY o_orderpriority
) t_q04
UNION ALL
SELECT 'q05' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + LENGTH(n_name)), 0) AS BIGINT) AS chk FROM (
SELECT n_name, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS c1
  FROM customer, orders, lineitem, supplier, nation, region
 WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
   AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
   AND r_name = 'ASIA'
   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
 GROUP BY n_name
) t_q05
UNION ALL
SELECT 'q06' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS chk FROM (
SELECT SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * CAST(ROUND(l_discount*100,0) AS BIGINT)) AS c1
  FROM lineitem
 WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
   AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
) t_q06
UNION ALL
SELECT 'q07' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + yr + LENGTH(supp_nation)), 0) AS BIGINT) AS chk FROM (
SELECT supp_nation, cust_nation, yr, SUM(rev4) AS c1
  FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS yr, CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)) AS rev4
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
           AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00') shipping
 GROUP BY supp_nation, cust_nation, yr
) t_q07
UNION ALL
SELECT 'q08' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(yr + c1 + c2), 0) AS BIGINT) AS chk FROM (
SELECT yr, SUM(CASE WHEN isn THEN rev4 ELSE 0 END) AS c1, SUM(rev4) AS c2
  FROM (SELECT year(o_orderdate) AS yr, CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)) AS rev4, n2.n_name = 'NATION_3' AS isn
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
           AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
           AND s_nationkey = n2.n_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND p_type = 'ECONOMY') x
 GROUP BY yr
) t_q08
UNION ALL
SELECT 'q09' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + yr + LENGTH(nation)), 0) AS BIGINT) AS chk FROM (
SELECT nation, yr, SUM(amount4) AS c1
  FROM (SELECT n_name AS nation, year(o_orderdate) AS yr,
               CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)) - CAST(ROUND(p_retailprice*100,0) AS BIGINT) * CAST(ROUND(l_quantity,0) AS BIGINT) AS amount4
          FROM part, supplier, lineitem, orders, nation
         WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
           AND s_nationkey = n_nationkey AND p_name LIKE '%red%') profit
 GROUP BY nation, yr
) t_q09
UNION ALL
SELECT 'q10' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c_custkey + c1), 0) AS BIGINT) AS chk FROM (
SELECT c_custkey, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS c1
  FROM customer, orders, lineitem
 WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
   AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
   AND l_returnflag = 'R'
 GROUP BY c_custkey
 ORDER BY c1 DESC, c_custkey LIMIT 20
) t_q10
UNION ALL
SELECT 'q11' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(l_partkey + c1), 0) AS BIGINT) AS chk FROM (
SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * CAST(ROUND(l_quantity,0) AS BIGINT)) AS c1
  FROM lineitem, supplier, nation
 WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
 GROUP BY l_partkey
HAVING SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * CAST(ROUND(l_quantity,0) AS BIGINT)) * 500 >
       (SELECT SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * CAST(ROUND(l_quantity,0) AS BIGINT))
          FROM lineitem, supplier, nation
         WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_5')
) t_q11
UNION ALL
SELECT 'q12' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 * 3 + c2), 0) AS BIGINT) AS chk FROM (
SELECT mode, SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS c1,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS c2
  FROM (SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS mode, l_orderkey
          FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00') l, orders
 WHERE l_orderkey = o_orderkey
 GROUP BY mode
) t_q12
UNION ALL
SELECT 'q13' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c_count * 7 + c1), 0) AS BIGINT) AS chk FROM (
SELECT c_count, COUNT(*) AS c1
  FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
         GROUP BY c_custkey) a
 GROUP BY c_count
) t_q13
UNION ALL
SELECT 'q14' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + c2), 0) AS BIGINT) AS chk FROM (
SELECT SUM(CASE WHEN p_type = 'PROMO' THEN CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)) ELSE 0 END) AS c1, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS c2
  FROM lineitem, part
 WHERE l_partkey = p_partkey
   AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
) t_q14
UNION ALL
SELECT 'q15' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(s_suppkey + c1), 0) AS BIGINT) AS chk FROM (
WITH revenue AS (SELECT l_suppkey AS supplier_no, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS total4
                   FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
                  GROUP BY l_suppkey)
SELECT s_suppkey, total4 AS c1
  FROM supplier, revenue
 WHERE s_suppkey = supplier_no AND total4 = (SELECT MAX(total4) FROM revenue)
) t_q15
UNION ALL
SELECT 'q16' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(p_size + c1 + LENGTH(p_brand)), 0) AS BIGINT) AS chk FROM (
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS c1
  FROM lineitem, part
 WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
   AND p_size IN (1, 5, 9, 13, 17, 21, 25, 49)
   AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
 GROUP BY p_brand, p_size
) t_q16
UNION ALL
SELECT 'q17' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS chk FROM (
SELECT SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS c1
  FROM lineitem, part
 WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
   AND l_quantity * 5 < (SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
) t_q17
UNION ALL
SELECT 'q18' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c_custkey + o_orderkey + c1), 0) AS BIGINT) AS chk FROM (
SELECT c_custkey, o_orderkey, CAST(ROUND(SUM(l_quantity),0) AS BIGINT) AS c1
  FROM customer, orders, lineitem
 WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
   AND c_custkey = o_custkey AND o_orderkey = l_orderkey
 GROUP BY c_custkey, o_orderkey
) t_q18
UNION ALL
SELECT 'q19' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS chk FROM (
SELECT SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS c1
  FROM lineitem, part
 WHERE p_partkey = l_partkey AND
       ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
) t_q19
UNION ALL
SELECT 'q20' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(s_suppkey + LENGTH(s_name)), 0) AS BIGINT) AS chk FROM (
SELECT s_suppkey, s_name
  FROM supplier
 WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem
                      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
                        AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
                      GROUP BY l_suppkey HAVING SUM(l_quantity) > 300)
) t_q20
UNION ALL
SELECT 'q21' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(c1 + LENGTH(s_name)), 0) AS BIGINT) AS chk FROM (
SELECT s_name, COUNT(*) AS c1
  FROM supplier, lineitem l1, orders, nation
 WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
   AND l1.l_shipdate > o_orderdate
   AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
   AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > l1.l_shipdate)
   AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
 GROUP BY s_name
) t_q21
UNION ALL
SELECT 'q22' AS q, COUNT(*) AS n_rows, CAST(COALESCE(SUM(cntry + c1 + c2), 0) AS BIGINT) AS chk FROM (
SELECT cntry, COUNT(*) AS c1, SUM(bal_cents) AS c2
  FROM (SELECT c_nationkey % 10 AS cntry, CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents, c_custkey
          FROM customer
         WHERE CAST(ROUND(c_acctbal*100,0) AS BIGINT) >
               (SELECT AVG(CAST(ROUND(c_acctbal*100,0) AS BIGINT)) FROM customer WHERE c_acctbal > 0.0)) c
 WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                     AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
 GROUP BY cntry
) t_q22"""
}
