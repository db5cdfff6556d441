-- generated: QueryGenerator.aliasWalkQuery(seed = 229,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, lineitem l1, lineitem l2, customer c1, part p1, orders o2, lineitem l3, supplier s1 WHERE l1.l_orderkey = o1.o_orderkey AND l2.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND p1.p_partkey = l2.l_partkey AND o2.o_orderkey = l2.l_orderkey AND l3.l_partkey = p1.p_partkey AND s1.s_suppkey = l1.l_suppkey AND s1.s_nationkey <> 3 AND o1.o_orderpriority <> '2-HIGH'
