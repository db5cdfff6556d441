-- generated: QueryGenerator.aliasWalkQuery(seed = 156,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, part p1, orders o1, lineitem l2, customer c1, orders o2, part p2, lineitem l3, orders o3, nation n1, customer c2, customer c3, supplier s1 WHERE p1.p_partkey = l1.l_partkey AND o1.o_orderkey = l1.l_orderkey AND l2.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND o2.o_orderkey = l1.l_orderkey AND p2.p_partkey = l2.l_partkey AND l3.l_orderkey = o1.o_orderkey AND o3.o_orderkey = l3.l_orderkey AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND c3.c_custkey = o1.o_custkey AND s1.s_suppkey = l3.l_suppkey AND p1.p_type > 'LARGE' AND p2.p_brand > 'Brand#20' AND p2.p_size > 23 AND (o3.o_orderpriority = '3-MEDIUM' OR l3.l_linestatus = 'O')
