-- generated: QueryGenerator.statsWalkQuery(seed = 5282,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, events e2, customer c2, events e3, nation n1 WHERE c1.c_custkey = e1.user_id AND e2.user_id = c1.c_custkey AND c2.c_custkey = e2.user_id AND e3.user_id = c1.c_custkey AND n1.n_nationkey = c2.c_nationkey AND n1.n_regionkey > 2 AND c1.c_mktsegment = 'FURNITURE' AND e2.event_type = 'signup' AND e2.value < 50 AND e3.value < 450
