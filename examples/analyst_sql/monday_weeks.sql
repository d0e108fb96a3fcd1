-- WEEK(d, 1): Monday start, week 1 needs >= 4 January days
-- (1994-01-01 is a Saturday: Jan 1-2 fall in week 0)
SELECT WEEK(o_orderdate, 1) AS wk_m1, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= '1994-01-01' AND o_orderdate < '1994-03-01'
GROUP BY WEEK(o_orderdate, 1)
ORDER BY wk_m1
