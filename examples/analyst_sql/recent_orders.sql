-- MySQL-flavored: STR_TO_DATE in WHERE + DATE_ADD(x, INTERVAL n unit)
SELECT o_orderpriority,
       COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= STR_TO_DATE('1995-01-01', '%Y-%m-%d')
  AND o_orderdate < DATE_ADD(STR_TO_DATE('1995-01-01', '%Y-%m-%d'), INTERVAL 3 MONTH)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
