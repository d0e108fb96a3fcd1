SET @base_price := 900;
SET @min_price := @base_price * 100;
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE o_totalprice > @min_price
GROUP BY o_orderstatus
ORDER BY o_orderstatus;
