-- generated: QueryGenerator.aliasWalkQuery(seed = 169,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, lineitem l1, customer c1, orders o2, part p1, lineitem l2, nation n1, part p2, lineitem l3, supplier s1, customer c2 WHERE l1.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND o2.o_custkey = c1.c_custkey AND p1.p_partkey = l1.l_partkey AND l2.l_orderkey = o2.o_orderkey AND n1.n_nationkey = c1.c_nationkey AND p2.p_partkey = l2.l_partkey AND l3.l_partkey = p2.p_partkey AND s1.s_suppkey = l2.l_suppkey AND c2.c_custkey = o2.o_custkey AND p2.p_size = 24 AND c2.c_mktsegment = 'BUILDING'
