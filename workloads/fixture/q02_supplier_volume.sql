SELECT s_name, count(*) AS n_items, round(sum(l_quantity), 2) AS qty
FROM supplier, lineitem
WHERE s_suppkey = l_suppkey
GROUP BY s_name ORDER BY s_name
