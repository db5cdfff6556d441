-- generated: QueryGenerator.aliasWalkQuery(seed = 191,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, lineitem l2, lineitem l3, part p2, supplier s1, supplier s2, orders o1, part p3 WHERE l1.l_partkey = p1.p_partkey AND l2.l_partkey = p1.p_partkey AND l3.l_partkey = p1.p_partkey AND p2.p_partkey = l1.l_partkey AND s1.s_suppkey = l2.l_suppkey AND s2.s_suppkey = l1.l_suppkey AND o1.o_orderkey = l2.l_orderkey AND p3.p_partkey = l2.l_partkey AND p1.p_brand = 'Brand#2' AND l2.l_returnflag = 'A' AND p1.p_size = 28
