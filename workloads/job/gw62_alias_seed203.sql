-- generated: QueryGenerator.aliasWalkQuery(seed = 203,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, supplier s1, region r1, customer c1, nation n2, nation n3, supplier s2, customer c2, customer c3 WHERE s1.s_nationkey = n1.n_nationkey AND r1.r_regionkey = n1.n_regionkey AND c1.c_nationkey = n1.n_nationkey AND n2.n_nationkey = s1.s_nationkey AND n3.n_nationkey = s1.s_nationkey AND s2.s_nationkey = n1.n_nationkey AND c2.c_nationkey = n1.n_nationkey AND c3.c_nationkey = n1.n_nationkey AND n2.n_regionkey = 4 AND c1.c_mktsegment <> 'BUILDING'
