USE warehouse;
SET character_set_results = utf8;
# IFNULL over a left join (MySQL # comment style)
SELECT n_name, IFNULL(t.n_cust, 0) AS n_customers
FROM nation
LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust
           FROM customer GROUP BY c_nationkey) t
  ON n_nationkey = t.c_nationkey
ORDER BY n_name;
