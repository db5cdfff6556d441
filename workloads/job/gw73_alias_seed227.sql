-- generated: QueryGenerator.aliasWalkQuery(seed = 227,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, orders o1, customer c1, customer c2, customer c3, lineitem l2, supplier s1, orders o2, supplier s2, nation n1 WHERE o1.o_orderkey = l1.l_orderkey AND c1.c_custkey = o1.o_custkey AND c2.c_custkey = o1.o_custkey AND c3.c_custkey = o1.o_custkey AND l2.l_orderkey = o1.o_orderkey AND s1.s_suppkey = l1.l_suppkey AND o2.o_custkey = c3.c_custkey AND s2.s_suppkey = l1.l_suppkey AND n1.n_nationkey = c1.c_nationkey AND c1.c_mktsegment > 'AUTOMOBILE' AND l1.l_linestatus <> 'F' AND l1.l_returnflag = 'N' AND s1.s_nationkey > 9 AND (l2.l_quantity = 6 OR o1.o_orderstatus = 'P')
