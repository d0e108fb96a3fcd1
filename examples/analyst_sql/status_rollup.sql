-- MySQL GROUP BY ... WITH ROLLUP (Spark accepts the same spelling)
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus, o_orderpriority WITH ROLLUP
ORDER BY o_orderstatus, o_orderpriority
