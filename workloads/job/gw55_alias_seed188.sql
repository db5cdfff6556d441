-- generated: QueryGenerator.aliasWalkQuery(seed = 188,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, orders o1, lineitem l2, orders o2, part p1, orders o3, supplier s1, nation n1, supplier s2, lineitem l3, customer c1, customer c2, nation n2 WHERE o1.o_orderkey = l1.l_orderkey AND l2.l_orderkey = o1.o_orderkey AND o2.o_orderkey = l1.l_orderkey AND p1.p_partkey = l2.l_partkey AND o3.o_orderkey = l2.l_orderkey AND s1.s_suppkey = l2.l_suppkey AND n1.n_nationkey = s1.s_nationkey AND s2.s_suppkey = l1.l_suppkey AND l3.l_partkey = p1.p_partkey AND c1.c_custkey = o3.o_custkey AND c2.c_nationkey = n1.n_nationkey AND n2.n_nationkey = c2.c_nationkey AND o3.o_orderpriority <> '4-NOT SPECIFIED' AND l1.l_quantity <> 14 AND p1.p_size = 50
