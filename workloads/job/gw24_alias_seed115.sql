-- generated: QueryGenerator.aliasWalkQuery(seed = 115,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, lineitem l1, nation n1, region r1, orders o2, customer c2, events e1, part p1, lineitem l2, customer c3, part p2 WHERE o1.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND n1.n_nationkey = c1.c_nationkey AND r1.r_regionkey = n1.n_regionkey AND o2.o_orderkey = l1.l_orderkey AND c2.c_nationkey = n1.n_nationkey AND e1.user_id = c2.c_custkey AND p1.p_partkey = l1.l_partkey AND l2.l_orderkey = o1.o_orderkey AND c3.c_custkey = e1.user_id AND p2.p_partkey = l1.l_partkey AND p2.p_brand <> 'Brand#16' AND n1.n_name > 'NATION_8' AND l2.l_quantity > 28 AND c3.c_mktsegment <> 'MACHINERY'
