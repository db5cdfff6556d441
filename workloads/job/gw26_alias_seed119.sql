-- generated: QueryGenerator.aliasWalkQuery(seed = 119,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM supplier s1, lineitem l1, orders o1, customer c1, supplier s2, lineitem l2, orders o2, lineitem l3 WHERE l1.l_suppkey = s1.s_suppkey AND o1.o_orderkey = l1.l_orderkey AND c1.c_custkey = o1.o_custkey AND s2.s_suppkey = l1.l_suppkey AND l2.l_orderkey = o1.o_orderkey AND o2.o_orderkey = l2.l_orderkey AND l3.l_suppkey = s2.s_suppkey AND l3.l_returnflag > 'A' AND l3.l_quantity > 11 AND (l1.l_returnflag = 'A' OR s2.s_nationkey = 9)
