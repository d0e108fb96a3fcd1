-- backslash-escaped quote + keyword-looking text inside a literal
SELECT COUNT(*) AS n_docs
FROM documents
WHERE text NOT LIKE 'it\'s a trap -- LIMIT 1, 2%'
