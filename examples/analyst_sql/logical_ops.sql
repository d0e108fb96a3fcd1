-- MySQL || and && are LOGICAL operators (PIPES_AS_CONCAT off)
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE (o_orderstatus = 'F' || o_orderstatus = 'O') && o_totalprice > 1000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
