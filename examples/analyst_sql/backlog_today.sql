-- CURDATE() (all fixture orders predate today, so the cut is stable)
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate <= CURDATE()
GROUP BY o_orderstatus
ORDER BY o_orderstatus
