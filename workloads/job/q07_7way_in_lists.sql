SELECT p_type, count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
FROM lineitem, orders, customer, part, supplier, nation cn, region cr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
  AND p_type IN ('PROMO', 'ECONOMY', 'SMALL')
  AND cn.n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7',
                    'NATION_9', 'NATION_11', 'NATION_13', 'NATION_15')
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
GROUP BY p_type ORDER BY p_type
