-- generated: QueryGenerator.aliasWalkQuery(seed = 155,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, lineitem l1, orders o2, customer c2, lineitem l2, lineitem l3, orders o3, nation n1, supplier s1, supplier s2, part p1, customer c3 WHERE o1.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND o2.o_custkey = c1.c_custkey AND c2.c_custkey = o2.o_custkey AND l2.l_orderkey = o1.o_orderkey AND l3.l_orderkey = o1.o_orderkey AND o3.o_orderkey = l2.l_orderkey AND n1.n_nationkey = c2.c_nationkey AND s1.s_suppkey = l1.l_suppkey AND s2.s_nationkey = n1.n_nationkey AND p1.p_partkey = l3.l_partkey AND c3.c_nationkey = n1.n_nationkey AND p1.p_brand = 'Brand#8' AND n1.n_regionkey < 2 AND o2.o_orderstatus = 'O'
