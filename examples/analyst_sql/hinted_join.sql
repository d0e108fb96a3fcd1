-- MySQL optimizer hints (index hints + STRAIGHT_JOIN) must strip cleanly
SELECT STRAIGHT_JOIN o.o_orderstatus, COUNT(*) AS n
FROM orders o USE INDEX (idx_orderdate)
JOIN customer c FORCE INDEX FOR JOIN (idx_ck) ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 0
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
