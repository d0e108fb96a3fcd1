-- null-safe equality (MySQL <=>, Spark-native)
SELECT COUNT(*) AS n_building
FROM customer
WHERE c_mktsegment <=> 'BUILDING'
