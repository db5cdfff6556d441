-- generated: QueryGenerator.aliasWalkQuery(seed = 148,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, customer c1, orders o1, customer c2, orders o2, nation n2, customer c3, supplier s1, lineitem l1 WHERE c1.c_nationkey = n1.n_nationkey AND o1.o_custkey = c1.c_custkey AND c2.c_custkey = o1.o_custkey AND o2.o_custkey = c2.c_custkey AND n2.n_nationkey = c2.c_nationkey AND c3.c_nationkey = n1.n_nationkey AND s1.s_nationkey = n2.n_nationkey AND l1.l_orderkey = o1.o_orderkey AND n2.n_name > 'NATION_23' AND l1.l_returnflag > 'N' AND l1.l_linestatus > 'F' AND (l1.l_quantity = 18 OR o2.o_orderstatus = 'F')
