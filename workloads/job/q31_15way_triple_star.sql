SELECT cn.n_name AS nation, count(*) AS n
FROM lineitem l1, lineitem l2, lineitem l3, orders,
     supplier s1, supplier s2, supplier s3,
     nation sn1, nation sn2, nation sn3,
     part p1, part p2, part p3, customer, nation cn
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l3.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND l2.l_linenumber < l3.l_linenumber
  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
  AND l3.l_suppkey = s3.s_suppkey
  AND s1.s_nationkey = sn1.n_nationkey AND s2.s_nationkey = sn2.n_nationkey
  AND s3.s_nationkey = sn3.n_nationkey
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND l3.l_partkey = p3.p_partkey
  AND o_custkey = c_custkey AND c_nationkey = cn.n_nationkey
  AND o_orderstatus = 'F' AND p1.p_size <= 20
GROUP BY cn.n_name ORDER BY cn.n_name
