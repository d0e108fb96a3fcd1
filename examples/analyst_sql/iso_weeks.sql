-- ISO week rollup: WEEK(d, 3) is ISO 8601 (Monday start, 1-53, year-wrapping)
SELECT WEEK(o_orderdate, 3) AS iso_week, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
GROUP BY WEEK(o_orderdate, 3)
ORDER BY iso_week
