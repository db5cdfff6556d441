SELECT cr.r_name AS c_region,
       count(DISTINCT c_custkey) AS n_customers,
       count(DISTINCT s_suppkey) AS n_suppliers,
       count(*) AS n
FROM lineitem, orders, customer, supplier, nation cn, nation sn, region cr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey
  AND l_returnflag = 'R'
GROUP BY cr.r_name ORDER BY cr.r_name
