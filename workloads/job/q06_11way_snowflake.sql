SELECT sn.n_name AS s_nation, year(o_orderdate) AS y,
       round(avg(l1.l_discount), 4) AS avg_disc, count(*) AS n
FROM lineitem l1, lineitem l2, orders, customer, supplier,
     part p1, part p2, nation cn, nation sn, region cr, region sr
WHERE l1.l_orderkey = o_orderkey AND l2.l_orderkey = o_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o_custkey = c_custkey AND l1.l_suppkey = s_suppkey
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
  AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'ASIA' AND p1.p_size > 40 AND p2.p_size < 20
  AND c_mktsegment = 'MACHINERY'
GROUP BY s_nation, y ORDER BY s_nation, y
