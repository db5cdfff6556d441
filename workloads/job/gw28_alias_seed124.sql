-- generated: QueryGenerator.aliasWalkQuery(seed = 124,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, customer c1, customer c2, events e1, nation n1, customer c3, supplier s1, orders o2, orders o3, lineitem l1 WHERE c1.c_custkey = o1.o_custkey AND c2.c_custkey = o1.o_custkey AND e1.user_id = c2.c_custkey AND n1.n_nationkey = c2.c_nationkey AND c3.c_custkey = o1.o_custkey AND s1.s_nationkey = n1.n_nationkey AND o2.o_custkey = c3.c_custkey AND o3.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND l1.l_linestatus <> 'F' AND l1.l_returnflag = 'R' AND e1.event_type < 'signup'
