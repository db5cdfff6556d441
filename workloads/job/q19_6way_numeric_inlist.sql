SELECT p_size, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
FROM lineitem, part, supplier, nation sn, orders, customer
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = sn.n_nationkey AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND p_size IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 43, 47)
  AND c_acctbal < 5000 AND l_quantity > 25
GROUP BY p_size ORDER BY p_size
