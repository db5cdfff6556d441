SELECT n_name, count(*) AS n
FROM region, nation, customer, orders, lineitem
WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND o_totalprice > 50000
GROUP BY n_name ORDER BY n_name
