SELECT c_mktsegment, count(*) AS n
FROM orders o1, orders o2, customer, nation cn, region cr,
     lineitem l1, lineitem l2
WHERE o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
  AND o1.o_orderkey < o2.o_orderkey
  AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
  AND l1.l_orderkey = o1.o_orderkey AND l2.l_orderkey = o2.o_orderkey
  AND l1.l_returnflag = 'R' AND l2.l_returnflag = 'R'
  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
  AND cr.r_name = 'AMERICA'
GROUP BY c_mktsegment ORDER BY c_mktsegment
