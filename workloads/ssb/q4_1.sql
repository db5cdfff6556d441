SELECT year(o_orderdate) AS y, cn.n_name AS c_nation,
       round(sum(l_extendedprice * (1 - l_discount - l_tax)), 2) AS profit
FROM customer, orders, lineitem, supplier, part,
     nation cn, nation sn, region cr, region sr
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
  AND p_type IN ('ECONOMY', 'PROMO')
GROUP BY y, c_nation ORDER BY y, c_nation
