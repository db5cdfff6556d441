SELECT year(o_orderdate) AS y, p_brand,
       round(sum(l_extendedprice * (1 - l_discount - l_tax)), 2) AS profit
FROM orders, lineitem, supplier, part, nation sn, region sr
WHERE o_orderkey = l_orderkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND s_nationkey = sn.n_nationkey AND sn.n_regionkey = sr.r_regionkey
  AND sr.r_name = 'EUROPE'
  AND year(o_orderdate) BETWEEN 1997 AND 1998
  AND p_brand BETWEEN 'Brand#30' AND 'Brand#36'
GROUP BY y, p_brand ORDER BY y, p_brand
