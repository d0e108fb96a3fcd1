-- MySQL-flavored file (runs with dialect="mysql"): GROUP_CONCAT + LIMIT off,cnt
SELECT o_orderstatus,
       GROUP_CONCAT(DISTINCT o_orderpriority SEPARATOR ' / ') AS priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY n_orders DESC
LIMIT 0, 10
