-- generated: QueryGenerator.aliasWalkQuery(seed = 201,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, nation n1, nation n2, orders o2, lineitem l1, lineitem l2, customer c2, customer c3, supplier s1 WHERE o1.o_custkey = c1.c_custkey AND n1.n_nationkey = c1.c_nationkey AND n2.n_nationkey = c1.c_nationkey AND o2.o_custkey = c1.c_custkey AND l1.l_orderkey = o2.o_orderkey AND l2.l_orderkey = o1.o_orderkey AND c2.c_nationkey = n1.n_nationkey AND c3.c_custkey = o1.o_custkey AND s1.s_nationkey = n1.n_nationkey AND n1.n_regionkey < 3 AND l2.l_returnflag <> 'R' AND o1.o_orderstatus < 'P'
