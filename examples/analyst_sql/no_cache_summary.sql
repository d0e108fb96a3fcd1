-- server cache/size modifiers are MySQL-only knobs
SELECT SQL_NO_CACHE SQL_BIG_RESULT l_returnflag, COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
