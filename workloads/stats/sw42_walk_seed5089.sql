-- generated: QueryGenerator.statsWalkQuery(seed = 5089,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, events e2, customer c1, nation n1, region r1, customer c2 WHERE e2.user_id = e1.user_id AND c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND r1.r_regionkey = n1.n_regionkey AND c2.c_nationkey = n1.n_nationkey AND e2.event_type = 'click' AND e1.event_type <> 'view'
