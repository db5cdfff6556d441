-- generated: QueryGenerator.aliasWalkQuery(seed = 199,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, orders o1, lineitem l2, orders o2, supplier s1, lineitem l3, customer c1, orders o3, supplier s2, customer c2, part p1, nation n1, customer c3 WHERE o1.o_orderkey = l1.l_orderkey AND l2.l_orderkey = o1.o_orderkey AND o2.o_orderkey = l2.l_orderkey AND s1.s_suppkey = l1.l_suppkey AND l3.l_suppkey = s1.s_suppkey AND c1.c_custkey = o2.o_custkey AND o3.o_orderkey = l2.l_orderkey AND s2.s_suppkey = l3.l_suppkey AND c2.c_custkey = o2.o_custkey AND p1.p_partkey = l1.l_partkey AND n1.n_nationkey = c2.c_nationkey AND c3.c_custkey = o2.o_custkey AND l3.l_quantity <> 38 AND s1.s_nationkey < 23 AND c1.c_mktsegment > 'AUTOMOBILE' AND l1.l_linestatus < 'O'
