SELECT min(c_name) AS first_customer, count(*) AS n
FROM lineitem, orders, part, supplier, customer,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND l_suppkey = s_suppkey AND o_custkey = c_custkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND c_acctbal < 100 AND sr.r_name = 'MIDDLE EAST'
  AND p_type = 'SMALL' AND l_quantity < 5
