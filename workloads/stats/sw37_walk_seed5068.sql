-- generated: QueryGenerator.statsWalkQuery(seed = 5068,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, customer c1, events e3 WHERE e2.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND e3.user_id = c1.c_custkey AND c1.c_mktsegment = 'BUILDING' AND e1.event_type = 'signup' AND e3.value < 150 AND e3.event_type <> 'purchase'
