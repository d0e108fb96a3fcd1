-- Window functions: top 3 customers by account balance per market segment
SELECT c_mktsegment, c_name, c_acctbal
FROM (
  SELECT c_mktsegment, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) t
WHERE rn <= 3
