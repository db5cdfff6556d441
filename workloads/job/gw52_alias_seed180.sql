-- generated: QueryGenerator.aliasWalkQuery(seed = 180,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, supplier s1, orders o1, supplier s2, customer c1, lineitem l2, part p1, nation n1 WHERE s1.s_suppkey = l1.l_suppkey AND o1.o_orderkey = l1.l_orderkey AND s2.s_suppkey = l1.l_suppkey AND c1.c_custkey = o1.o_custkey AND l2.l_suppkey = s2.s_suppkey AND p1.p_partkey = l2.l_partkey AND n1.n_nationkey = c1.c_nationkey AND n1.n_regionkey = 3 AND l2.l_quantity = 27 AND s1.s_nationkey < 15
