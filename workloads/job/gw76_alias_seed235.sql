-- generated: QueryGenerator.aliasWalkQuery(seed = 235,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, nation n2, region r2, region r3, nation n3, customer c1, supplier s1, supplier s2 WHERE n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n1.n_regionkey AND r3.r_regionkey = n1.n_regionkey AND n3.n_regionkey = r2.r_regionkey AND c1.c_nationkey = n3.n_nationkey AND s1.s_nationkey = n2.n_nationkey AND s2.s_nationkey = n1.n_nationkey AND n2.n_regionkey <> 1 AND r1.r_name = 'ASIA'
