-- generated: QueryGenerator.aliasWalkQuery(seed = 171,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, orders o1, lineitem l2, customer c1, customer c2, supplier s1, part p2, lineitem l3, customer c3 WHERE l1.l_partkey = p1.p_partkey AND o1.o_orderkey = l1.l_orderkey AND l2.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND c2.c_custkey = o1.o_custkey AND s1.s_suppkey = l2.l_suppkey AND p2.p_partkey = l2.l_partkey AND l3.l_suppkey = s1.s_suppkey AND c3.c_custkey = o1.o_custkey AND s1.s_nationkey > 1 AND c2.c_mktsegment <> 'MACHINERY' AND l2.l_linestatus = 'F' AND (l2.l_quantity = 37 OR p2.p_type = 'MEDIUM')
