SELECT year(o_orderdate) AS y, count(*) AS n
FROM lineitem, orders, customer, part, supplier, nation cn,
     nation sn, region cr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
  AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
  AND sn.n_name IN ('NATION_2', 'NATION_4', 'NATION_6', 'NATION_8')
GROUP BY year(o_orderdate) ORDER BY y
