-- generated: QueryGenerator.statsWalkQuery(seed = 5025,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, nation n1, region r1, events e2 WHERE c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND r1.r_regionkey = n1.n_regionkey AND e2.user_id = c1.c_custkey AND r1.r_name = 'AFRICA' AND c1.c_mktsegment = 'AUTOMOBILE' AND e1.value < 100
