-- generated: QueryGenerator.aliasWalkQuery(seed = 216,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, supplier s1, nation n2, region r2, lineitem l1, orders o1, orders o2, customer c1, lineitem l2 WHERE n1.n_regionkey = r1.r_regionkey AND s1.s_nationkey = n1.n_nationkey AND n2.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n2.n_regionkey AND l1.l_suppkey = s1.s_suppkey AND o1.o_orderkey = l1.l_orderkey AND o2.o_orderkey = l1.l_orderkey AND c1.c_custkey = o2.o_custkey AND l2.l_orderkey = o2.o_orderkey AND n1.n_regionkey > 1 AND o2.o_orderpriority <> '2-HIGH'
