-- generated: QueryGenerator.statsWalkQuery(seed = 14846,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, events e3, events e4, customer c1, nation n1, customer c2 WHERE e2.user_id = e1.user_id AND e3.user_id = e2.user_id AND e4.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND e2.event_type = 'purchase' AND e4.event_type = 'error' AND e2.value < 50 AND c1.c_mktsegment <> 'BUILDING' AND e1.event_type = 'signup'
