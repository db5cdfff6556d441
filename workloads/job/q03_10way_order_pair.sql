SELECT min(p1.p_name) AS part_a, min(p2.p_name) AS part_b, count(*) AS n
FROM lineitem l1, lineitem l2, orders, customer, part p1, part p2,
     nation cn, region cr, supplier, nation sn
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o_custkey = c_custkey
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND l1.l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
  AND cr.r_name = 'AMERICA' AND p1.p_type = 'ECONOMY'
  AND p2.p_type = 'LARGE' AND o_orderstatus = 'F'
