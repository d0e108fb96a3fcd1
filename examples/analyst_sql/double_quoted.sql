-- MySQL double-quoted STRING literal (ANSI_QUOTES off)
SELECT c_nationkey, COUNT(*) AS n
FROM customer
WHERE c_mktsegment = "BUILDING"
GROUP BY c_nationkey
ORDER BY c_nationkey
