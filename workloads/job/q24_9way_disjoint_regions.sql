SELECT cr.r_name AS c_region, sr.r_name AS s_region, count(*) AS n
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_regionkey <> sr.r_regionkey
  AND p_size <= 25 AND o_orderstatus = 'O'
GROUP BY cr.r_name, sr.r_name ORDER BY c_region, s_region
