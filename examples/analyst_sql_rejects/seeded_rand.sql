SELECT r_name, RAND(42) AS jitter FROM region
