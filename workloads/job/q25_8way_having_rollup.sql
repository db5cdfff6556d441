SELECT cn.n_name AS nation, p_brand, count(*) AS n
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey
  AND cr.r_name = 'AMERICA'
GROUP BY cn.n_name, p_brand
HAVING count(*) > 1
ORDER BY cn.n_name, p_brand
