-- generated: QueryGenerator.aliasWalkQuery(seed = 151,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM supplier s1, nation n1, nation n2, region r1, supplier s2, supplier s3, nation n3, customer c1, lineitem l1, orders o1, customer c2 WHERE n1.n_nationkey = s1.s_nationkey AND n2.n_nationkey = s1.s_nationkey AND r1.r_regionkey = n2.n_regionkey AND s2.s_nationkey = n1.n_nationkey AND s3.s_nationkey = n2.n_nationkey AND n3.n_nationkey = s1.s_nationkey AND c1.c_nationkey = n1.n_nationkey AND l1.l_suppkey = s2.s_suppkey AND o1.o_orderkey = l1.l_orderkey AND c2.c_nationkey = n2.n_nationkey AND r1.r_name = 'EUROPE' AND l1.l_quantity > 7 AND o1.o_orderstatus <> 'O'
