SET @max_price := (SELECT MAX(o_totalprice) FROM orders);
SELECT @max_price AS max_price;
