-- generated: QueryGenerator.statsWalkQuery(seed = 5156,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, customer c2, events e3 WHERE c1.c_custkey = e1.user_id AND e2.user_id = e1.user_id AND c2.c_custkey = e2.user_id AND e3.user_id = e2.user_id AND e1.value > 450 AND e2.event_type <> 'signup' AND e2.value < 400
