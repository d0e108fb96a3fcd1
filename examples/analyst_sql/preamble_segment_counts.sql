USE analytics;
SET NAMES utf8mb4;
-- per-segment customer counts with an IF() size class
SELECT `c_mktsegment` AS segment, COUNT(*) AS n_customers,
       IF(COUNT(*) > 100, 'big', 'small') AS size_class
FROM `customer`
GROUP BY `c_mktsegment`
ORDER BY segment;
