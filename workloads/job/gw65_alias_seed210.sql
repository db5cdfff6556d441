-- generated: QueryGenerator.aliasWalkQuery(seed = 210,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, lineitem l1, orders o2, orders o3, customer c2, customer c3, supplier s1, supplier s2, part p1 WHERE o1.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND o2.o_custkey = c1.c_custkey AND o3.o_custkey = c1.c_custkey AND c2.c_custkey = o3.o_custkey AND c3.c_custkey = o3.o_custkey AND s1.s_suppkey = l1.l_suppkey AND s2.s_suppkey = l1.l_suppkey AND p1.p_partkey = l1.l_partkey AND s2.s_nationkey < 23 AND c3.c_mktsegment = 'BUILDING' AND p1.p_size > 26 AND s1.s_nationkey > 8
