-- generated: QueryGenerator.statsWalkQuery(seed = 6010,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, customer c1, nation n1, customer c2, events e3 WHERE e2.user_id = e1.user_id AND c1.c_custkey = e2.user_id AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND e3.user_id = e2.user_id AND e2.value > 450 AND c1.c_mktsegment = 'HOUSEHOLD' AND e3.event_type = 'view' AND e2.event_type <> 'error' AND n1.n_regionkey > 1
