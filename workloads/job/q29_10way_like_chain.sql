SELECT p_brand, count(*) AS n,
       round(sum(l_extendedprice), 2) AS gross
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr, nation xn
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND xn.n_regionkey = cr.r_regionkey
  AND p_name LIKE '%bolt%'
  AND c_name LIKE 'Customer%1%'
  AND xn.n_name LIKE 'NATION_1%'
GROUP BY p_brand ORDER BY p_brand
