-- generated: QueryGenerator.statsWalkQuery(seed = 5412,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, customer c2, events e2 WHERE c1.c_custkey = e1.user_id AND c2.c_custkey = e1.user_id AND e2.user_id = c1.c_custkey AND e2.value < 400 AND e1.event_type = 'view' AND e1.value > 150 AND e2.event_type = 'click' AND c1.c_mktsegment = 'AUTOMOBILE'
