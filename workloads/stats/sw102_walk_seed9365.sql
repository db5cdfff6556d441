-- generated: QueryGenerator.statsWalkQuery(seed = 9365,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, nation n1, customer c2, events e3, events e4 WHERE c1.c_custkey = e1.user_id AND e2.user_id = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND e3.user_id = c2.c_custkey AND e4.user_id = c2.c_custkey AND e3.event_type = 'error' AND c1.c_mktsegment = 'AUTOMOBILE' AND e4.value > 450 AND e4.event_type = 'click'
