-- generated: QueryGenerator.aliasWalkQuery(seed = 163,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, lineitem l2, orders o1, supplier s1, lineitem l3, orders o2, supplier s2, supplier s3, part p2, orders o3 WHERE l1.l_partkey = p1.p_partkey AND l2.l_partkey = p1.p_partkey AND o1.o_orderkey = l2.l_orderkey AND s1.s_suppkey = l2.l_suppkey AND l3.l_partkey = p1.p_partkey AND o2.o_orderkey = l3.l_orderkey AND s2.s_suppkey = l2.l_suppkey AND s3.s_suppkey = l2.l_suppkey AND p2.p_partkey = l2.l_partkey AND o3.o_orderkey = l1.l_orderkey AND p2.p_brand <> 'Brand#10' AND o3.o_orderpriority < '4-NOT SPECIFIED' AND s2.s_nationkey <> 0 AND s1.s_nationkey = 1
