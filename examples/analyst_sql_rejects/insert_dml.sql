INSERT INTO audit_log SELECT o_orderkey, 'seen' FROM orders
