-- GROUP_CONCAT with an explicit ORDER BY key
SELECT o_orderstatus,
       GROUP_CONCAT(DISTINCT o_orderpriority ORDER BY o_orderpriority DESC SEPARATOR ' > ') AS priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus;
