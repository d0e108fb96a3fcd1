-- Explicit Sunday-mode WEEK(d, 0): days before the year's first Sunday are week 0
-- (1996-01-01 is a Monday, so Jan 1-6 land in week 0)
SELECT WEEK(o_orderdate, 0) AS wk, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-03-01'
GROUP BY WEEK(o_orderdate, 0)
ORDER BY wk
