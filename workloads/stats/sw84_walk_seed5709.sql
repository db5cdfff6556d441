-- generated: QueryGenerator.statsWalkQuery(seed = 5709,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, nation n1, region r1, customer c2, events e2, events e3 WHERE c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND r1.r_regionkey = n1.n_regionkey AND c2.c_custkey = e1.user_id AND e2.user_id = c2.c_custkey AND e3.user_id = e2.user_id AND c1.c_mktsegment = 'HOUSEHOLD' AND e1.value < 350
