SELECT sr.r_name AS s_region, count(*) AS n
FROM lineitem l1, lineitem l2, orders, supplier s1, supplier s2,
     nation sn1, nation sn2, region sr, customer
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
  AND s1.s_nationkey = sn1.n_nationkey AND s2.s_nationkey = sn2.n_nationkey
  AND sn1.n_regionkey = sr.r_regionkey
  AND (sn2.n_name = sn1.n_name OR l2.l_quantity > 45)
  AND o_custkey = c_custkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'A'
GROUP BY sr.r_name ORDER BY sr.r_name
