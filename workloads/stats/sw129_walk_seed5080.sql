-- generated: QueryGenerator.statsWalkQuery(seed = 5080,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, events e3 WHERE e2.user_id = e1.user_id AND e3.user_id = e2.user_id AND e2.value < 150 AND e1.value > 150 AND e3.event_type = 'error'
