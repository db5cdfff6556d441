-- generated: QueryGenerator.statsWalkQuery(seed = 5623,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, events e3, customer c1, nation n1 WHERE e2.user_id = e1.user_id AND e3.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND n1.n_regionkey > 0 AND e2.value < 150 AND e2.event_type = 'signup' AND c1.c_mktsegment = 'BUILDING'
