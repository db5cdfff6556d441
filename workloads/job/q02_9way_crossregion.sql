SELECT cn.n_name AS c_nation, min(s_name) AS first_supplier,
       count(*) AS n
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'EUROPE' AND sr.r_name = 'ASIA'
  AND c_mktsegment = 'BUILDING' AND p_size < 10
GROUP BY cn.n_name ORDER BY cn.n_name
