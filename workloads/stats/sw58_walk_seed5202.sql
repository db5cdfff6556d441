-- generated: QueryGenerator.statsWalkQuery(seed = 5202,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, nation n1, customer c2, events e2 WHERE c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND e2.user_id = c1.c_custkey AND c1.c_mktsegment = 'FURNITURE' AND n1.n_regionkey > 0
