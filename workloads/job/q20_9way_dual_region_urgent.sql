SELECT cn.n_name AS nation, min(s_name) AS first_supplier,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'MIDDLE EAST' AND sr.r_name = 'EUROPE'
  AND o_orderpriority = '1-URGENT' AND p_retailprice > 1000
GROUP BY cn.n_name ORDER BY nation
