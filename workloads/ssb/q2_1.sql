SELECT year(o_orderdate) AS y, p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, orders, part, supplier, nation, region
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY y, p_brand ORDER BY y, p_brand
