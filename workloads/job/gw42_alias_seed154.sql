-- generated: QueryGenerator.aliasWalkQuery(seed = 154,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, customer c1, orders o2, customer c2, lineitem l1, customer c3, nation n1, supplier s1, supplier s2, nation n2 WHERE c1.c_custkey = o1.o_custkey AND o2.o_custkey = c1.c_custkey AND c2.c_custkey = o1.o_custkey AND l1.l_orderkey = o2.o_orderkey AND c3.c_custkey = o1.o_custkey AND n1.n_nationkey = c1.c_nationkey AND s1.s_nationkey = n1.n_nationkey AND s2.s_suppkey = l1.l_suppkey AND n2.n_nationkey = c1.c_nationkey AND l1.l_quantity > 17 AND s1.s_nationkey < 9
