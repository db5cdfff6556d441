SELECT sr1.r_name AS s1_region, count(*) AS n,
       round(sum(l1.l_extendedprice * (1 - l1.l_discount)), 2) AS revenue
FROM lineitem l1, lineitem l2, orders, customer,
     supplier s1, supplier s2, part p1,
     nation cn, nation sn1, nation sn2,
     region cr, region sr1, region sr2
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o_custkey = c_custkey
  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
  AND l1.l_partkey = p1.p_partkey
  AND c_nationkey = cn.n_nationkey
  AND s1.s_nationkey = sn1.n_nationkey AND s2.s_nationkey = sn2.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey
  AND sn1.n_regionkey = sr1.r_regionkey AND sn2.n_regionkey = sr2.r_regionkey
  AND cr.r_name = 'ASIA' AND p1.p_type = 'ECONOMY'
GROUP BY sr1.r_name ORDER BY sr1.r_name
