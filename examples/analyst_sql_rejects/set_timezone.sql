SET time_zone = '+00:00';
SELECT COUNT(*) AS n FROM orders;
