SELECT p1.p_type AS t1, p2.p_type AS t2, count(*) AS n
FROM lineitem l1, lineitem l2, orders, customer,
     part p1, part p2, supplier s1, supplier s2,
     nation cn, nation sn1, nation sn2
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
  AND s1.s_nationkey = sn1.n_nationkey AND s2.s_nationkey = sn2.n_nationkey
  AND o_custkey = c_custkey AND c_nationkey = cn.n_nationkey
  AND p1.p_size < p2.p_size
  AND o_orderpriority = '1-URGENT'
GROUP BY p1.p_type, p2.p_type ORDER BY t1, t2
