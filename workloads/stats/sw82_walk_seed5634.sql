-- generated: QueryGenerator.statsWalkQuery(seed = 5634,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, nation n1 WHERE c1.c_custkey = e1.user_id AND e2.user_id = c1.c_custkey AND n1.n_nationkey = c1.c_nationkey AND e2.value < 150 AND e1.event_type = 'error'
