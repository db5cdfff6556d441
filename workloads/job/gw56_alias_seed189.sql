-- generated: QueryGenerator.aliasWalkQuery(seed = 189,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, customer c1, customer c2, customer c3, orders o2, nation n1, orders o3, lineitem l1, nation n2, lineitem l2 WHERE c1.c_custkey = o1.o_custkey AND c2.c_custkey = o1.o_custkey AND c3.c_custkey = o1.o_custkey AND o2.o_custkey = c3.c_custkey AND n1.n_nationkey = c1.c_nationkey AND o3.o_custkey = c2.c_custkey AND l1.l_orderkey = o2.o_orderkey AND n2.n_nationkey = c3.c_nationkey AND l2.l_orderkey = o3.o_orderkey AND l1.l_returnflag > 'A' AND l1.l_linestatus > 'F'
