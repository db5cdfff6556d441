-- generated: QueryGenerator.statsWalkQuery(seed = 5299,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, customer c2 WHERE c1.c_custkey = e1.user_id AND c2.c_custkey = e1.user_id AND c1.c_mktsegment <> 'HOUSEHOLD' AND e1.event_type = 'view' AND c2.c_mktsegment <> 'AUTOMOBILE' AND e1.value < 400
