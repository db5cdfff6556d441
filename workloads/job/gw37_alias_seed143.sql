-- generated: QueryGenerator.aliasWalkQuery(seed = 143,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, supplier s1, lineitem l2, part p2, lineitem l3, part p3, orders o1, orders o2, orders o3, nation n1, customer c1 WHERE l1.l_partkey = p1.p_partkey AND s1.s_suppkey = l1.l_suppkey AND l2.l_partkey = p1.p_partkey AND p2.p_partkey = l1.l_partkey AND l3.l_partkey = p2.p_partkey AND p3.p_partkey = l2.l_partkey AND o1.o_orderkey = l3.l_orderkey AND o2.o_orderkey = l3.l_orderkey AND o3.o_orderkey = l1.l_orderkey AND n1.n_nationkey = s1.s_nationkey AND c1.c_nationkey = n1.n_nationkey AND s1.s_nationkey <> 24 AND c1.c_mktsegment <> 'HOUSEHOLD' AND l3.l_quantity < 8
