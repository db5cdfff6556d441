-- generated: QueryGenerator.aliasWalkQuery(seed = 130,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, customer c1, customer c2, customer c3, orders o1, nation n2, lineitem l1, supplier s1 WHERE c1.c_nationkey = n1.n_nationkey AND c2.c_nationkey = n1.n_nationkey AND c3.c_nationkey = n1.n_nationkey AND o1.o_custkey = c1.c_custkey AND n2.n_nationkey = c1.c_nationkey AND l1.l_orderkey = o1.o_orderkey AND s1.s_nationkey = n2.n_nationkey AND l1.l_linestatus = 'F' AND n1.n_regionkey < 2 AND c2.c_mktsegment > 'BUILDING'
