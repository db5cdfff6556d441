-- generated: QueryGenerator.statsWalkQuery(seed = 5123,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, events e3, events e4, customer c1 WHERE e2.user_id = e1.user_id AND e3.user_id = e1.user_id AND e4.user_id = e1.user_id AND c1.c_custkey = e4.user_id AND e2.event_type <> 'view' AND e1.value < 100 AND e3.value > 250 AND e4.event_type = 'signup'
