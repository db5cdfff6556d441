-- generated: QueryGenerator.aliasWalkQuery(seed = 142,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, orders o2, events e1, customer c2, customer c3, nation n1, events e2, supplier s1 WHERE o1.o_custkey = c1.c_custkey AND o2.o_custkey = c1.c_custkey AND e1.user_id = c1.c_custkey AND c2.c_custkey = e1.user_id AND c3.c_custkey = e1.user_id AND n1.n_nationkey = c2.c_nationkey AND e2.user_id = c2.c_custkey AND s1.s_nationkey = n1.n_nationkey AND c3.c_mktsegment < 'MACHINERY' AND o1.o_orderpriority <> '4-NOT SPECIFIED'
