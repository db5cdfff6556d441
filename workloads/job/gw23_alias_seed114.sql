-- generated: QueryGenerator.aliasWalkQuery(seed = 114,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, lineitem l2, orders o1, orders o2, supplier s1, customer c1, part p2 WHERE l1.l_partkey = p1.p_partkey AND l2.l_partkey = p1.p_partkey AND o1.o_orderkey = l1.l_orderkey AND o2.o_orderkey = l1.l_orderkey AND s1.s_suppkey = l1.l_suppkey AND c1.c_custkey = o1.o_custkey AND p2.p_partkey = l1.l_partkey AND l1.l_quantity < 20 AND o1.o_orderstatus = 'P' AND p1.p_type < 'SMALL' AND s1.s_nationkey <> 2 AND (o2.o_orderstatus = 'F' OR l1.l_linestatus = 'F')
