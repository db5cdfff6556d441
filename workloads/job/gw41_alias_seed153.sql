-- generated: QueryGenerator.aliasWalkQuery(seed = 153,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM supplier s1, lineitem l1, orders o1, lineitem l2, customer c1, lineitem l3, nation n1, orders o2 WHERE l1.l_suppkey = s1.s_suppkey AND o1.o_orderkey = l1.l_orderkey AND l2.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND l3.l_orderkey = o1.o_orderkey AND n1.n_nationkey = s1.s_nationkey AND o2.o_orderkey = l3.l_orderkey AND o2.o_orderstatus < 'O' AND l3.l_linestatus = 'O' AND n1.n_name < 'NATION_20' AND o1.o_orderstatus <> 'P' AND (l2.l_linestatus = 'F' OR n1.n_regionkey = 4)
