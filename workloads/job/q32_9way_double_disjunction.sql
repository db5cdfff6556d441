SELECT cr.r_name AS c_region, count(*) AS n
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND (cr.r_name = 'ASIA' OR sr.r_name = 'AMERICA')
  AND (p_type = 'PROMO' OR o_orderpriority = '1-URGENT')
  AND l_returnflag = 'R'
GROUP BY cr.r_name ORDER BY cr.r_name
