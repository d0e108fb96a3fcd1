USE analytics;
CREATE TABLE tmp_report AS SELECT COUNT(*) FROM orders;
