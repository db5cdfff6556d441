SELECT min(p_name) AS first_part, count(*) AS n,
       round(avg(l_discount), 4) AS avg_disc
FROM lineitem, orders, part, supplier, nation sn, region sr
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
  AND sn.n_regionkey = sr.r_regionkey
  AND p_name LIKE '%widget%' AND sr.r_name = 'EUROPE'
  AND o_totalprice > 50000
