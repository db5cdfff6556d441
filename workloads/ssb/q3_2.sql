SELECT cn.n_name AS c_nation, sn.n_name AS s_nation, year(o_orderdate) AS y,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier,
     nation cn, nation sn, region cr, region sr
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'EUROPE' AND sr.r_name = 'EUROPE'
  AND year(o_orderdate) BETWEEN 1996 AND 1998
GROUP BY c_nation, s_nation, y ORDER BY y, revenue DESC, c_nation, s_nation
