-- generated: QueryGenerator.aliasWalkQuery(seed = 104,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, lineitem l1, part p1, orders o2, customer c1, lineitem l2, nation n1, orders o3, customer c2, lineitem l3, supplier s1 WHERE l1.l_orderkey = o1.o_orderkey AND p1.p_partkey = l1.l_partkey AND o2.o_orderkey = l1.l_orderkey AND c1.c_custkey = o1.o_custkey AND l2.l_partkey = p1.p_partkey AND n1.n_nationkey = c1.c_nationkey AND o3.o_orderkey = l2.l_orderkey AND c2.c_custkey = o3.o_custkey AND l3.l_orderkey = o3.o_orderkey AND s1.s_nationkey = n1.n_nationkey AND n1.n_regionkey = 1 AND l1.l_returnflag = 'A' AND o2.o_orderstatus = 'F' AND o3.o_orderpriority = '2-HIGH'
