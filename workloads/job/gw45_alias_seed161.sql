-- generated: QueryGenerator.aliasWalkQuery(seed = 161,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, lineitem l1, customer c1, orders o2, part p1, part p2, lineitem l2, orders o3, lineitem l3, customer c2, nation n1, customer c3 WHERE l1.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND o2.o_orderkey = l1.l_orderkey AND p1.p_partkey = l1.l_partkey AND p2.p_partkey = l1.l_partkey AND l2.l_partkey = p2.p_partkey AND o3.o_orderkey = l1.l_orderkey AND l3.l_orderkey = o2.o_orderkey AND c2.c_custkey = o3.o_custkey AND n1.n_nationkey = c2.c_nationkey AND c3.c_custkey = o1.o_custkey AND p2.p_brand < 'Brand#7' AND p1.p_type > 'PROMO' AND l2.l_linestatus <> 'F'
