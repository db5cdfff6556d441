-- generated: QueryGenerator.statsWalkQuery(seed = 5044,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, customer c1 WHERE e2.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND e2.value < 450 AND e1.value > 150
