SELECT l_returnflag, count(*) AS n,
       round(sum(l_extendedprice), 2) AS gross
FROM lineitem, orders, customer, supplier, nation cn, nation sn, region cr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey
  AND o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
  AND l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1998-06-30'
  AND cr.r_name = 'EUROPE'
GROUP BY l_returnflag ORDER BY l_returnflag
