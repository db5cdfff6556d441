-- generated: QueryGenerator.aliasWalkQuery(seed = 195,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, part p1, lineitem l2, part p2, orders o1, lineitem l3, supplier s1, supplier s2, part p3, nation n1, orders o2 WHERE p1.p_partkey = l1.l_partkey AND l2.l_partkey = p1.p_partkey AND p2.p_partkey = l1.l_partkey AND o1.o_orderkey = l2.l_orderkey AND l3.l_orderkey = o1.o_orderkey AND s1.s_suppkey = l3.l_suppkey AND s2.s_suppkey = l2.l_suppkey AND p3.p_partkey = l2.l_partkey AND n1.n_nationkey = s2.s_nationkey AND o2.o_orderkey = l2.l_orderkey AND l3.l_quantity > 36 AND p2.p_type <> 'SMALL' AND p1.p_type < 'LARGE' AND p1.p_size < 17
