SELECT p1.p_type AS type_a, p2.p_type AS type_b, count(*) AS n
FROM lineitem l1, lineitem l2, part p1, part p2, orders,
     customer, nation cn, supplier, region cr
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND l1.l_suppkey = s_suppkey AND o_custkey = c_custkey
  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
  AND p1.p_size < 15 AND p2.p_size > 35 AND cr.r_name = 'AFRICA'
GROUP BY p1.p_type, p2.p_type ORDER BY type_a, type_b
