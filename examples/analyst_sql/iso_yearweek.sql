-- YEARWEEK(d, 3): ISO year*100 + ISO week (mode 3 + MySQL's forced
-- WEEK_YEAR bit) - year-boundary days carry the adjacent ISO year
SELECT YEARWEEK(o_orderdate, 3) AS iso_yw, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= '1994-12-01' AND o_orderdate < '1995-02-01'
GROUP BY YEARWEEK(o_orderdate, 3)
ORDER BY iso_yw
