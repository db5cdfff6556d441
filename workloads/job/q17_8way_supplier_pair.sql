SELECT s_name, count(*) AS n
FROM lineitem l1, lineitem l2, supplier, orders o1, orders o2,
     part, nation sn, region sr
WHERE l1.l_suppkey = s_suppkey AND l2.l_suppkey = s_suppkey
  AND l1.l_orderkey = o1.o_orderkey AND l2.l_orderkey = o2.o_orderkey
  AND o1.o_orderkey < o2.o_orderkey
  AND l1.l_partkey = p_partkey AND l2.l_partkey = p_partkey
  AND s_nationkey = sn.n_nationkey AND sn.n_regionkey = sr.r_regionkey
  AND p_type = 'MEDIUM' AND sr.r_name = 'ASIA'
GROUP BY s_name ORDER BY s_name
