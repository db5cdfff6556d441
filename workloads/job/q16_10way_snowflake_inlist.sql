SELECT cn.n_name AS nation, p_type, count(*) AS n
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr, region xr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_regionkey = xr.r_regionkey
  AND xr.r_name IN ('ASIA', 'EUROPE') AND sr.r_name IN ('ASIA', 'AFRICA')
  AND p_type IN ('LARGE', 'STANDARD') AND c_acctbal > 0
GROUP BY cn.n_name, p_type ORDER BY nation, p_type
