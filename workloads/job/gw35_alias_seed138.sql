-- generated: QueryGenerator.aliasWalkQuery(seed = 138,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, orders o2, customer c2, customer c3, nation n1, orders o3, nation n2, nation n3, supplier s1, supplier s2, lineitem l1 WHERE o1.o_custkey = c1.c_custkey AND o2.o_custkey = c1.c_custkey AND c2.c_custkey = o2.o_custkey AND c3.c_custkey = o1.o_custkey AND n1.n_nationkey = c1.c_nationkey AND o3.o_custkey = c3.c_custkey AND n2.n_nationkey = c1.c_nationkey AND n3.n_nationkey = c2.c_nationkey AND s1.s_nationkey = n3.n_nationkey AND s2.s_nationkey = n3.n_nationkey AND l1.l_orderkey = o2.o_orderkey AND n1.n_name < 'NATION_20' AND o2.o_orderpriority = '3-MEDIUM' AND l1.l_quantity = 6 AND (o1.o_orderstatus = 'O' OR n2.n_regionkey = 0)
