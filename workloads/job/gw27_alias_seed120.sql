-- generated: QueryGenerator.aliasWalkQuery(seed = 120,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, customer c1, nation n1, lineitem l1, lineitem l2, nation n2, supplier s1, lineitem l3 WHERE c1.c_custkey = o1.o_custkey AND n1.n_nationkey = c1.c_nationkey AND l1.l_orderkey = o1.o_orderkey AND l2.l_orderkey = o1.o_orderkey AND n2.n_nationkey = c1.c_nationkey AND s1.s_nationkey = n1.n_nationkey AND l3.l_suppkey = s1.s_suppkey AND o1.o_orderstatus > 'O' AND l1.l_quantity = 18
