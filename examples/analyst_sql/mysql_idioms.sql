-- infix MOD, unary BINARY (case-sensitivity force), GROUP BY ordinal
SELECT o_orderkey MOD 4 AS bucket, COUNT(*) AS n
FROM orders
WHERE BINARY o_orderstatus = 'O'
GROUP BY 1
ORDER BY bucket;
