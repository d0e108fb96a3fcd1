-- constant user-variable cutoff, the classic 5.7 analyst pattern
SET @cutoff := '1995-06-01';
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= @cutoff
GROUP BY o_orderpriority
ORDER BY o_orderpriority;
