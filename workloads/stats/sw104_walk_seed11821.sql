-- generated: QueryGenerator.statsWalkQuery(seed = 11821,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, nation n1, events e3, region r1 WHERE c1.c_custkey = e1.user_id AND e2.user_id = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND e3.user_id = c1.c_custkey AND r1.r_regionkey = n1.n_regionkey AND r1.r_name = 'MIDDLE EAST' AND n1.n_regionkey > 3 AND e3.value < 300 AND e3.event_type = 'view'
