SELECT sn.n_name AS nation, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem, orders, customer, supplier, part,
     nation sn, nation cn, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND s_nationkey = sn.n_nationkey AND c_nationkey = cn.n_nationkey
  AND sn.n_nationkey = cn.n_nationkey
  AND sn.n_regionkey = sr.r_regionkey
  AND p_size BETWEEN 10 AND 30 AND l_returnflag = 'N'
GROUP BY sn.n_name ORDER BY nation
