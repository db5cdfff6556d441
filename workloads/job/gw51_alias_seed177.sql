-- generated: QueryGenerator.aliasWalkQuery(seed = 177,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, nation n2, nation n3, region r2, region r3, supplier s1, lineitem l1, customer c1 WHERE n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey AND n3.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n2.n_regionkey AND r3.r_regionkey = n3.n_regionkey AND s1.s_nationkey = n2.n_nationkey AND l1.l_suppkey = s1.s_suppkey AND c1.c_nationkey = n3.n_nationkey AND l1.l_linestatus > 'F' AND n2.n_regionkey = 0
