-- generated: QueryGenerator.statsWalkQuery(seed = 5053,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2 WHERE c1.c_custkey = e1.user_id AND e2.user_id = e1.user_id AND c1.c_mktsegment = 'MACHINERY' AND e2.event_type = 'signup'
