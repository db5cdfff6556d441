SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, count(*) AS n
FROM customer, supplier, nation n1, nation n2, region r1,
     orders, lineitem
WHERE c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
  AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey
  AND n1.n_nationkey < n2.n_nationkey
  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND r1.r_name = 'ASIA'
GROUP BY n1.n_name, n2.n_name ORDER BY nation_a, nation_b
