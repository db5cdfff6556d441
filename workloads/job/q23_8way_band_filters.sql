SELECT sn.n_name AS s_nation, count(*) AS n,
       round(avg(p_retailprice), 2) AS avg_price
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND sn.n_regionkey = sr.r_regionkey
  AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
  AND p_retailprice BETWEEN 920.0 AND 980.0
  AND l_quantity BETWEEN 5 AND 40
  AND s_acctbal BETWEEN 0 AND 8000
GROUP BY sn.n_name ORDER BY sn.n_name
