-- SUBSTRING_INDEX (Spark-native MySQL function)
SELECT SUBSTRING_INDEX(c_name, '#', -1) AS name_suffix, COUNT(*) AS n
FROM customer
GROUP BY SUBSTRING_INDEX(c_name, '#', -1)
ORDER BY name_suffix
LIMIT 10
