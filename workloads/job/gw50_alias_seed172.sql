-- generated: QueryGenerator.aliasWalkQuery(seed = 172,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM events e1, customer c1, nation n1, customer c2, orders o1, orders o2, lineitem l1, lineitem l2, orders o3 WHERE c1.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND c2.c_custkey = e1.user_id AND o1.o_custkey = c1.c_custkey AND o2.o_custkey = c1.c_custkey AND l1.l_orderkey = o2.o_orderkey AND l2.l_orderkey = o2.o_orderkey AND o3.o_custkey = c1.c_custkey AND o3.o_orderstatus <> 'F' AND l1.l_quantity < 3
