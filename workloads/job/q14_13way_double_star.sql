SELECT cr.r_name AS c_region, sr.r_name AS s_region, count(*) AS n,
       round(sum(l1.l_extendedprice * (1 - l1.l_discount)), 2) AS revenue
FROM lineitem l1, lineitem l2, orders, customer, supplier s1,
     supplier s2, part p1, part p2, nation cn, nation sn1, nation sn2,
     region cr, region sr
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o_custkey = c_custkey
  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND c_nationkey = cn.n_nationkey
  AND s1.s_nationkey = sn1.n_nationkey AND s2.s_nationkey = sn2.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn1.n_regionkey = sr.r_regionkey
  AND p1.p_type = 'PROMO' AND o_orderstatus = 'O'
GROUP BY cr.r_name, sr.r_name ORDER BY c_region, s_region
