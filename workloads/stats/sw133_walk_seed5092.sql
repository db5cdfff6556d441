-- generated: QueryGenerator.statsWalkQuery(seed = 5092,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, events e3, customer c1, events e4, customer c2, nation n1 WHERE e2.user_id = e1.user_id AND e3.user_id = e2.user_id AND c1.c_custkey = e1.user_id AND e4.user_id = e3.user_id AND c2.c_custkey = e4.user_id AND n1.n_nationkey = c2.c_nationkey AND n1.n_regionkey > 0 AND e1.value > 450
