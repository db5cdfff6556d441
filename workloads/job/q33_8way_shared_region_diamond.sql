SELECT r.r_name AS region, count(*) AS n
FROM lineitem, orders, customer, supplier,
     nation cn, nation sn, region r, part
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = r.r_regionkey AND sn.n_regionkey = r.r_regionkey
  AND o_orderstatus = 'O' AND p_size >= 10
GROUP BY r.r_name ORDER BY r.r_name
