-- generated: QueryGenerator.aliasWalkQuery(seed = 187,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, customer c1, events e1, customer c2, customer c3, nation n1, orders o2, orders o3, events e2, nation n2, nation n3, region r1, lineitem l1 WHERE c1.c_custkey = o1.o_custkey AND e1.user_id = c1.c_custkey AND c2.c_custkey = e1.user_id AND c3.c_custkey = e1.user_id AND n1.n_nationkey = c1.c_nationkey AND o2.o_custkey = c3.c_custkey AND o3.o_custkey = c1.c_custkey AND e2.user_id = c3.c_custkey AND n2.n_nationkey = c3.c_nationkey AND n3.n_nationkey = c3.c_nationkey AND r1.r_regionkey = n2.n_regionkey AND l1.l_orderkey = o2.o_orderkey AND n2.n_regionkey = 0 AND n2.n_name = 'NATION_20' AND o1.o_orderstatus < 'O' AND o2.o_orderstatus = 'F'
