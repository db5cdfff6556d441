SELECT r_name, count(*) AS n_orders
FROM region, nation, customer, orders
WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
  AND c_custkey = o_custkey
GROUP BY r_name ORDER BY r_name
