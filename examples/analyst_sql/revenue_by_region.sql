-- Star join: revenue per region per year (Spark SQL dialect)
SELECT r.r_name AS region, YEAR(o.o_orderdate) AS order_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, YEAR(o.o_orderdate)
ORDER BY region, order_year
