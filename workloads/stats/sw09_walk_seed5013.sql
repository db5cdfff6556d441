-- generated: QueryGenerator.statsWalkQuery(seed = 5013,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, events e3, customer c2, nation n1 WHERE c1.c_custkey = e1.user_id AND e2.user_id = e1.user_id AND e3.user_id = c1.c_custkey AND c2.c_custkey = e2.user_id AND n1.n_nationkey = c1.c_nationkey AND n1.n_regionkey > 1 AND e2.value < 400 AND e1.event_type = 'view' AND e3.event_type <> 'view' AND c2.c_mktsegment = 'BUILDING'
