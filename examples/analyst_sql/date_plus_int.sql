-- date +/- integer: day arithmetic (the analyst intent; MySQL's numeric
-- day-number coercion is a documented delta - see COVERAGE.md dialect notes)
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= DATE('1996-06-01') - 90
  AND o_orderdate < DATE('1996-06-01') + 7
GROUP BY o_orderpriority
ORDER BY o_orderpriority
