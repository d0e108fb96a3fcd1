-- MySQL-flavored: DATE_FORMAT %-patterns in SELECT and GROUP BY,
-- LIMIT offset,count pagination
SELECT DATE_FORMAT(o_orderdate, '%Y-%m') AS ym,
       COUNT(*) AS n_orders
FROM orders
GROUP BY DATE_FORMAT(o_orderdate, '%Y-%m')
ORDER BY ym
LIMIT 5, 10
