-- generated: QueryGenerator.aliasWalkQuery(seed = 105,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, customer c1, nation n2, region r2, customer c2, nation n3, region r3 WHERE n1.n_regionkey = r1.r_regionkey AND c1.c_nationkey = n1.n_nationkey AND n2.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n1.n_regionkey AND c2.c_nationkey = n1.n_nationkey AND n3.n_regionkey = r2.r_regionkey AND r3.r_regionkey = n2.n_regionkey AND r2.r_name > 'EUROPE' AND n2.n_name > 'NATION_18' AND c2.c_mktsegment > 'HOUSEHOLD'
