SELECT p_type, count(*) AS n
FROM part, lineitem
WHERE p_partkey = l_partkey AND l_quantity > 25
GROUP BY p_type ORDER BY p_type
