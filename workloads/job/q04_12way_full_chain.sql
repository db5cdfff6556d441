SELECT year(o_orderdate) AS y, count(*) AS n,
       round(sum(l1.l_extendedprice), 2) AS gross
FROM lineitem l1, lineitem l2, orders, customer,
     supplier s1, supplier s2, part p1, part p2,
     nation cn, nation sn, region cr, region sr
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o_custkey = c_custkey
  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND c_nationkey = cn.n_nationkey AND s1.s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'AFRICA' AND sr.r_name = 'EUROPE'
  AND p1.p_brand = 'Brand#1' AND o_orderpriority = '5-LOW'
GROUP BY y ORDER BY y
