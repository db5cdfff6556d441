-- generated: QueryGenerator.statsWalkQuery(seed = 5009,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, events e3, events e4 WHERE e2.user_id = e1.user_id AND e3.user_id = e1.user_id AND e4.user_id = e1.user_id AND e1.event_type = 'click' AND e1.value > 450
