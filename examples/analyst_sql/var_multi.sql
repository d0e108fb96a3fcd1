SET @lo = 5, @hi = 15;
SELECT p_size, COUNT(*) AS n
FROM part
WHERE p_size BETWEEN @lo AND @hi
GROUP BY p_size
ORDER BY p_size;
