-- MySQL INSERT() string splice
SELECT INSERT(o_orderpriority, 2, 1, '~') AS spliced, COUNT(*) AS n
FROM orders
GROUP BY 1
ORDER BY spliced;
