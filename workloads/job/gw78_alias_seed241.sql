-- generated: QueryGenerator.aliasWalkQuery(seed = 241,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, customer c2, customer c3, events e3, nation n1, nation n2, supplier s1 WHERE c1.c_custkey = e1.user_id AND e2.user_id = c1.c_custkey AND c2.c_custkey = e1.user_id AND c3.c_custkey = e1.user_id AND e3.user_id = c1.c_custkey AND n1.n_nationkey = c2.c_nationkey AND n2.n_nationkey = c2.c_nationkey AND s1.s_nationkey = n2.n_nationkey AND c2.c_mktsegment <> 'HOUSEHOLD' AND s1.s_nationkey > 0
