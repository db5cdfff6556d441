-- generated: QueryGenerator.aliasWalkQuery(seed = 222,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM supplier s1, nation n1, region r1, nation n2, nation n3, lineitem l1, lineitem l2, region r2, orders o1, supplier s2, customer c1 WHERE n1.n_nationkey = s1.s_nationkey AND r1.r_regionkey = n1.n_regionkey AND n2.n_regionkey = r1.r_regionkey AND n3.n_regionkey = r1.r_regionkey AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s1.s_suppkey AND r2.r_regionkey = n1.n_regionkey AND o1.o_orderkey = l2.l_orderkey AND s2.s_nationkey = n3.n_nationkey AND c1.c_nationkey = n1.n_nationkey AND l1.l_quantity = 36 AND o1.o_orderstatus <> 'O' AND l1.l_linestatus = 'F' AND (n2.n_regionkey = 3 OR r1.r_name = 'MIDDLE EAST')
