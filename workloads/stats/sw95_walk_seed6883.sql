-- generated: QueryGenerator.statsWalkQuery(seed = 6883,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, nation n1, customer c2 WHERE c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND n1.n_regionkey < 1 AND e1.event_type = 'error' AND c1.c_mktsegment <> 'MACHINERY'
