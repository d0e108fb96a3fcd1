-- DATE_SUB / ADDDATE with INTERVAL, STR_TO_DATE %-patterns nested inside
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderdate >= DATE_SUB(STR_TO_DATE('1996-06-01', '%Y-%m-%d'), INTERVAL 90 DAY)
  AND o_orderdate < ADDDATE(STR_TO_DATE('1996-06-01', '%Y-%m-%d'), INTERVAL 1 WEEK)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
