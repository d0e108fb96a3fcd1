SET @rt := 0;
SELECT o_orderkey, @rt := @rt + o_totalprice AS running_total FROM orders;
