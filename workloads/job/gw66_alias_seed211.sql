-- generated: QueryGenerator.aliasWalkQuery(seed = 211,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, events e1, nation n1, nation n2, customer c2, region r1, nation n3, customer c3 WHERE e1.user_id = c1.c_custkey AND n1.n_nationkey = c1.c_nationkey AND n2.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND r1.r_regionkey = n2.n_regionkey AND n3.n_nationkey = c1.c_nationkey AND c3.c_nationkey = n3.n_nationkey AND n2.n_regionkey = 0 AND n2.n_name < 'NATION_4' AND c3.c_mktsegment <> 'BUILDING'
