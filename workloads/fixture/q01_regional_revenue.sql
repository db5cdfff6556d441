SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
