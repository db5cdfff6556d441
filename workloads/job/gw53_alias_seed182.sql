-- generated: QueryGenerator.aliasWalkQuery(seed = 182,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, nation n1, customer c2, orders o1, lineitem l1, nation n2, supplier s1, region r1, customer c3, orders o2, nation n3, supplier s2, supplier s3 WHERE n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND o1.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND n2.n_nationkey = c2.c_nationkey AND s1.s_suppkey = l1.l_suppkey AND r1.r_regionkey = n1.n_regionkey AND c3.c_custkey = o1.o_custkey AND o2.o_custkey = c2.c_custkey AND n3.n_nationkey = c2.c_nationkey AND s2.s_suppkey = l1.l_suppkey AND s3.s_nationkey = n1.n_nationkey AND l1.l_linestatus <> 'O' AND s2.s_nationkey <> 4 AND l1.l_quantity < 2
