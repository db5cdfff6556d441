SELECT cn.n_name AS nation, count(*) AS n
FROM lineitem, orders, customer, supplier, nation cn, nation sn
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND c_nationkey = s_nationkey
  AND o_orderstatus = 'F'
GROUP BY cn.n_name ORDER BY cn.n_name
