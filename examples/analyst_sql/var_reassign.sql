SET @seg := 'AUTOMOBILE';
SET @seg := 'BUILDING';  -- last assignment wins, sequential semantics
SELECT COUNT(*) AS n_customers FROM customer WHERE c_mktsegment = @seg;
