-- TIMESTAMPDIFF / TIMESTAMPADD / DATEDIFF: the MySQL temporal-diff trio.
-- Spark implements all three natively with MySQL's exact semantics
-- (complete-unit TIMESTAMPDIFF, end-of-month-clamped TIMESTAMPADD,
-- day-boundary DATEDIFF) -- pinned here against a DuckDB twin that
-- re-derives complete months from calendar arithmetic.
SELECT o_orderpriority,
       COUNT(*) AS n,
       SUM(CASE WHEN TIMESTAMPDIFF(MONTH, o_orderdate, TIMESTAMP '1998-01-01 00:00:00') >= 12
                THEN 1 ELSE 0 END) AS older_than_year,
       MAX(DATEDIFF(DATE '1998-12-31', o_orderdate)) AS max_age_days
FROM orders
WHERE o_orderdate < TIMESTAMPADD(MONTH, -6, TIMESTAMP '1998-08-01 00:00:00')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
