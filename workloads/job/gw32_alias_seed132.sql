-- generated: QueryGenerator.aliasWalkQuery(seed = 132,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, region r1, nation n2, region r2, region r3, customer c1, nation n3, customer c2, events e1, customer c3, events e2 WHERE r1.r_regionkey = n1.n_regionkey AND n2.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n2.n_regionkey AND r3.r_regionkey = n2.n_regionkey AND c1.c_nationkey = n2.n_nationkey AND n3.n_regionkey = r2.r_regionkey AND c2.c_nationkey = n2.n_nationkey AND e1.user_id = c2.c_custkey AND c3.c_custkey = e1.user_id AND e2.user_id = c1.c_custkey AND c2.c_mktsegment < 'FURNITURE' AND n2.n_regionkey = 4 AND (e2.event_type = 'click' OR c3.c_mktsegment = 'AUTOMOBILE')
