-- generated: QueryGenerator.statsWalkQuery(seed = 5150,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, customer c1, customer c2, events e3, events e4, nation n1 WHERE e2.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND c2.c_custkey = e2.user_id AND e3.user_id = e1.user_id AND e4.user_id = c1.c_custkey AND n1.n_nationkey = c2.c_nationkey AND e2.event_type = 'view' AND e3.event_type = 'click' AND e3.value > 100 AND e4.value < 50
