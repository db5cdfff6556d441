-- generated: QueryGenerator.statsWalkQuery(seed = 7833,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, events e3, events e4, nation n1 WHERE c1.c_custkey = e1.user_id AND e2.user_id = c1.c_custkey AND e3.user_id = c1.c_custkey AND e4.user_id = e2.user_id AND n1.n_nationkey = c1.c_nationkey AND n1.n_regionkey > 2 AND e1.event_type = 'signup' AND e4.value < 50 AND e3.value < 200
