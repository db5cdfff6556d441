-- generated: QueryGenerator.statsWalkQuery(seed = 7825,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, customer c1, events e3, events e4, nation n1, region r1 WHERE e2.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND e3.user_id = e1.user_id AND e4.user_id = c1.c_custkey AND n1.n_nationkey = c1.c_nationkey AND r1.r_regionkey = n1.n_regionkey AND e1.value > 50 AND e3.value > 400 AND e4.event_type = 'signup' AND e4.value > 250
