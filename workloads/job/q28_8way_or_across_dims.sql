SELECT o_orderpriority, count(*) AS n
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey
  AND (cn.n_name = 'NATION_2' OR sn.n_name = 'NATION_4'
       OR p_type = 'PROMO')
GROUP BY o_orderpriority ORDER BY o_orderpriority
