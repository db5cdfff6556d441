-- generated: QueryGenerator.statsWalkQuery(seed = 5239,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, customer c2 WHERE c1.c_custkey = e1.user_id AND e2.user_id = e1.user_id AND c2.c_custkey = e2.user_id AND e1.event_type = 'error' AND c1.c_mktsegment = 'FURNITURE'
